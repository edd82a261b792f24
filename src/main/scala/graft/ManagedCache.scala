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
  */
object ManagedCache {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and track it for [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist every tracked frame (non-blocking) and clear the registry. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Number of currently tracked (persisted, unreleased) frames. */
  def trackedCount: Int = synchronized(tracked.size)
}
