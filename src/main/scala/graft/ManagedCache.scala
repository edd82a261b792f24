package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracked persistence for the intermediate frames the dedup/similarity
  * pipelines must cache (their self-joins read the same expensive frame
  * from both sides; without a persist the whole signature pipeline computes
  * twice — the round-1 cost bug).
  *
  * A builder cannot unpersist its own caches: the returned DataFrame is
  * lazy, so the cache must outlive the builder call and be released after
  * the CALLER's consuming action. This registry makes that contract
  * explicit: pipelines persist through [[persist]], and the drivers
  * (Verify, Bench — and any library user running query-at-a-time) call
  * [[releaseAll]] between queries so a long session never accumulates
  * cache entries.
  *
  * CONTRACT: this is a process-global registry built for a single driver
  * thread running queries sequentially (the Verify/Bench shape). Calling
  * [[releaseAll]] while another thread's query is mid-execution is safe for
  * correctness (Spark recomputes evicted blocks) but silently forfeits the
  * cache; concurrent multi-query drivers should serialize around it.
  */
object ManagedCache {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and track it for [[releaseAll]].
    * Idempotent per logical plan: if an equivalent plan is already cached
    * (e.g. a benchmark loop rebuilding the same query), the existing cache
    * is reused instead of re-registering — no duplicate tracking entries,
    * no "already cached" churn. */
  def persist(df: DataFrame): DataFrame = synchronized {
    if (df.storageLevel == StorageLevel.NONE) {
      tracked += df
      df.persist(StorageLevel.MEMORY_AND_DISK)
    } else df
  }

  /** Unpersist every tracked frame and clear the registry. Blocking, so a
    * caller timing the NEXT query never races block eviction (the round-3
    * bench-noise post-mortem). */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = true))
    tracked.clear()
  }

  /** Number of currently tracked (persisted, unreleased) frames. */
  def trackedCount: Int = synchronized(tracked.size)
}
