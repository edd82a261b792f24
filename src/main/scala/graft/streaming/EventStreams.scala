package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  ListState, MapState, OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Typed event row for the custom-state pipeline (matches the `events`
  * table after [[Tables.loadEvents]]' timestamp conversion). */
case class SessionEvent(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** One closed session emitted by [[EventStreams.sessionizeCustomState]]. */
case class ClosedSession(
    user_id: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    n_events: Long)

/** Open-session state carried between micro-batches. */
case class SessionState(start: Long, lastTs: Long, n: Long)

/** Input row for [[EventStreams.domainCapStream]]: a document keyed to
  * its registered domain, carrying the content-keyed rank key (md5 of
  * the text) that makes admission order reproducible. */
case class DomainDoc(doc_id: Long, domain: String, rk_key: String)

/** An admitted document with its per-domain admission rank (1-based). */
case class CappedDoc(doc_id: Long, domain: String, rk: Int)

/** Structured Streaming twins of the batch event analytics in
  * [[graft.EventQueries]] (the reference has no streaming surface at all —
  * SURVEY §2.12; this is driver-north-star scope). Same groupings and
  * aggregate semantics; correctness of the shared logic is oracle-checked
  * through the batch twins, and the streaming plumbing (watermarks, window
  * state, incremental emission) is asserted in StreamingSpec over a
  * MemoryStream.
  *
  * Scale: state is keyed by (window, event_type) / (session, user_id) —
  * the same shuffle keys as the batch twins, so executors hold only their
  * key range's state; watermarks bound state size by evicting windows older
  * than the lateness horizon. That is the property that lets these run
  * indefinitely on an unbounded 100 TB/day event firehose.
  */
object EventStreams {

  /** Streaming s01: tumbling 1-hour windows per event_type, tolerating
    * 2 hours of event-time lateness. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("sv"))

  /** s29's hourly count with a ZERO-lateness watermark: the strictest
    * late-data policy, so the drop semantics themselves become
    * observable (with s01's 2-hour tolerance nothing in the gate
    * corpus would drop). Append mode: a window emits once the
    * watermark passes its end and never updates again — which is
    * exactly why rows landing in an already-closed window must drop. */
  def lateWindowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w").getField("start").as("window_start"), col("n"))

  /** CHAINED STATEFUL OPERATORS (s37): dropDuplicatesWithinWatermark
    * feeding a windowed aggregation in ONE streaming query — the
    * multi-stateful pipeline (SPARK-42376) that an ingest firehose
    * actually runs (dedup the at-least-once transport, then aggregate
    * the survivors) without materializing an intermediate topic.
    * Append mode is mandatory for the chain; the dedup operator
    * forwards the event-time watermark so the downstream agg evicts
    * and emits exactly as if fed from a clean source. State: dedup
    * keyed by event_id inside the watermark horizon, agg keyed by
    * (window) — both bounded, both sharded on their keys across
    * executors. */
  def dedupThenHourlyCounts(rows: DataFrame,
      lateness: String = "0 seconds"): DataFrame =
    rows
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w").getField("start").as("window_start"), col("n"))

  /** Multi-micro-batch landing-dir harness (s29 + spec): write each
    * frame as a single parquet FILE with strictly increasing
    * modification times, so a file stream with maxFilesPerTrigger=1
    * deterministically replays them as batch 0, 1, 2, … — the
    * arrival-order control MemoryStream gives specs, reproduced on the
    * real file source the driver-facing entries must use. Fixed epoch
    * mtimes keep the ordering independent of wall clock (and well
    * inside the source's relative maxFileAge window). */
  private[graft] def writeBatchLanding(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, batches: Seq[DataFrame]): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    def put(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/_tmp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"no part file written under $tmp"))
      val dst = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      fs.rename(part, dst)
      fs.delete(tmp, true)
      fs.setTimes(dst, mtime, -1)
    }
    val t0 = 1700000000000L
    batches.zipWithIndex.foreach { case (df, i) =>
      put(df, f"batch_$i%03d", t0 + i * 60000L)
    }
  }

  /** Streaming s04: gap-based sessionization via session_window — the
    * built-in generalization of the batch lag→flag→running-sum pipeline
    * (identical 30-minute inactivity gap). */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming s02: running per-user activity rollup (update-mode state).
    * NOTE on state: a global running rollup is keyed by user_id with no
    * time dimension, so no watermark applies — state is bounded by USER
    * CARDINALITY, not stream length. That is fine for a bounded user
    * population; for an unbounded key space, window the rollup (as
    * [[hourlyAgg]] does) so watermarks can evict, or move to
    * `mapGroupsWithState` with a state TTL. */
  def userActivity(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))

  /** Streaming trending terms — the windowed twin of the batch vocabulary
    * head (t07) over a DOCUMENT stream (ts, text): explode tokens, count
    * per (tumbling window, term), watermark bounds the state to the
    * lateness horizon × active-vocabulary size. Consumers rank per window
    * downstream (top-k over an update-mode sink or the finalized append
    * output). */
  def trendingTerms(
      docs: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", lateness)
      .select(col("ts"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(window(col("ts"), windowLen).as("w"), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("h"), col("term"), col("n"))

  /** Streaming s20 twin: stateless JSON payload extraction (explicit
    * declared schema — never inference) feeding a running per-type
    * rollup. Same no-watermark state note as [[userActivity]]: state is
    * bounded by event-TYPE cardinality. The batch entry's exact
    * distinct-count is deliberately absent — streaming aggregation
    * cannot maintain exact distincts incrementally; production tracks
    * approximate distincts with a mergeable HLL sketch (t28's register
    * layout) as the update-mode column. */
  def jsonPropsAgg(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Stream-static enrichment: join the live stream against a static
    * dimension, broadcast. Stream-static joins are STATELESS — each
    * micro-batch joins against the dimension as re-planned for that batch,
    * so no watermark and no state store are involved, and a dimension
    * update (new files under the same path) is picked up on the next
    * batch. The broadcast keeps the stream side shuffle-free — at a
    * 100 TB/day ingest rate the event stream never repartitions just to
    * pick up dimension attributes. */
  def enrichStream(
      events: DataFrame,
      dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** STREAM-STREAM attribution join: match each view to the purchases the
    * same user makes within `window` afterwards — the online
    * click-through-attribution shape, and the one streaming join class
    * [[enrichStream]] (stream-static) cannot express. Both sides carry
    * watermarks and the join condition bounds buy_ts to
    * (view_ts, view_ts + window], so each side's state store retains only
    * the lateness + window horizon — bounded state on an unbounded
    * firehose. INNER join emits eagerly as matches arrive (no
    * watermark-wait on emission), so the settled output equals the batch
    * self-join on the same data. One stream filtered twice is a
    * supported self-join (two scans of the source). */
  def attributionJoin(
      events: DataFrame,
      window: String = "2 hours",
      lateness: String = "2 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", lateness)
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("buy_user"), col("ts").as("buy_ts"),
        col("value").as("buy_value"))
      .withWatermark("buy_ts", lateness)
    views.join(buys,
      col("user_id") === col("buy_user") &&
        col("buy_ts") > col("view_ts") &&
        col("buy_ts") <= col("view_ts") + expr(s"INTERVAL $window"))
      .select(col("user_id"), col("view_ts"), col("buy_ts"),
        col("buy_value"))
  }

  /** s30: watermarked LEFT OUTER stream-stream attribution — the outer
    * twin of [[attributionJoin]], and the semantically hard half:
    * matched pairs emit eagerly like the inner join, but an UNMATCHED
    * view can only emit (null-padded) once the GLOBAL watermark — the
    * minimum across both input streams — proves no qualifying purchase
    * can still arrive (watermark past view_ts + window). Until then it
    * pends in state; a view too close to end-of-stream never emits at
    * all. Both sides must carry watermarks and the join condition must
    * bound event-time distance — that pair of constraints is what makes
    * the state provably evictable on an unbounded firehose. */
  def attributionJoinOuter(
      views: DataFrame,
      buys: DataFrame,
      window: String = "1 hour"): DataFrame = {
    val v = views.withWatermark("view_ts", "0 seconds")
    val b = buys.withWatermark("buy_ts", "0 seconds")
    v.join(b,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr(s"INTERVAL $window"),
        "left_outer")
      .select(col("user_id"), col("view_ts"), col("buy_ts"),
        col("buy_value"))
  }

  /** s34: watermarked FULL OUTER stream-stream attribution — completes
    * the join family (inner s14, left s30): BOTH sides null-pad.
    * An unmatched view emits (view, null-buy) once the global watermark
    * passes `view_ts + window`; an unmatched purchase emits
    * (null-view, buy) once the watermark passes `buy_ts` — the latest
    * possible matching view time under the condition, which is what
    * makes the BUY side's state evictable too. The output key is
    * `coalesce` of the two sides' user columns, so every row carries
    * its user regardless of which side survived. */
  def attributionJoinFull(
      views: DataFrame,
      buys: DataFrame,
      window: String = "1 hour"): DataFrame = {
    val v = views.withWatermark("view_ts", "0 seconds")
    val b = buys.withWatermark("buy_ts", "0 seconds")
    v.join(b,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr(s"INTERVAL $window"),
        "full_outer")
      .select(coalesce(col("user_id"), col("buy_user")).as("user_id"),
        col("view_ts"), col("buy_ts"), col("buy_value"))
  }

  /** Latest-event-per-user reduction — the MERGE function of the
    * streaming upsert: `max(struct(ts, event_id, …))` compares ts first,
    * then the unique event_id, so the pick is total-order deterministic
    * AND the aggregate is algebraic (partial-aggregatable map-side,
    * mergeable across micro-batches — associativity is exactly what makes
    * batch-boundary-independence of the upsert result provable). */
  def latestPerUser(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("m"))
      .select(col("user_id"), col("m.ts").as("ts"),
        col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type"),
        col("m.value").as("value"))

  /** STREAMING UPSERT via foreachBatch — the lakehouse MERGE-INTO shape
    * none of the other gates cover: each micro-batch folds into a
    * COMMITTED key-latest table (one row per user_id, last event wins)
    * through the same copy-on-write + atomic `_latest` pointer protocol
    * as the DML store (DmlQueries), so a concurrent reader always sees a
    * complete committed version. Because [[latestPerUser]] is an
    * associative merge, the settled table is independent of how the
    * stream was micro-batched — the oracle states the batch argmax.
    *
    * Scale: per batch, the merge reads the (|users|-sized) current table
    * and the batch delta — one shuffle on user_id each; the event
    * firehose itself never re-shuffles beyond its own reduction. A real
    * deployment swaps the full-table rewrite for a partitioned/bucketed
    * MERGE (rewrite only touched user buckets) on the identical
    * commit protocol. Blocks until AvailableNow drains; returns the
    * committed table.
    *
    * CRASH REPLAY: foreachBatch is at-least-once — a crash between
    * `Dml.commit(dir, v$id)` and the streaming checkpoint's own commit
    * replays batch `id` on restart. Without a guard, the replay would
    * read `_latest` (now v$id) while overwrite-writing the same
    * `$dir/v$id` path — Spark aborts ("Cannot overwrite a path that is
    * also being read from") and recovery wedges permanently. The guard
    * below skips any batch whose version is already at or behind the
    * committed pointer: the merge is an idempotent argmax, so the
    * committed v$id already contains this batch's contribution, and
    * AvailableNow replays only the last un-checkpointed batch (never a
    * batch AHEAD of the pointer with different data). */
  def upsertedLatest(
      spark: org.apache.spark.sql.SparkSession,
      events: DataFrame,
      dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val q = events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val hasLatest = java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, "_latest"))
        val committedId: Long =
          if (hasLatest) Dml.currentVersion(dir).stripPrefix("v").toLong
          else -1L
        // CHECKPOINT IDENTITY: batch ids are only comparable WITHIN one
        // checkpoint lineage — if `$dir/_chk` is deleted and recreated
        // while `_latest` survives, ids restart at 0 and a bare
        // `committedId >= id` guard would silently discard new data
        // until id caught up. The commit marker therefore records WHICH
        // checkpoint (its stable query id from `_chk/metadata`) produced
        // the last merged batch, and a batch is skipped as a replay only
        // when both the identity matches AND its id is already marked.
        val chkId = checkpointQueryId(dir)
        val lastMerged = readBatchMark(dir)
        val isReplay = lastMerged.exists { case (mid, mbatch) =>
          mid == chkId && mbatch >= id }
        if (isReplay) {
          // replayed batch whose merge already committed — skip; the
          // pointer already reflects it (idempotent argmax). Loud by
          // design: a skip should be visible in the driver log.
          System.err.println(
            s"[upsertedLatest] skipping replayed batch $id " +
              s"(checkpoint $chkId already merged it)")
        } else {
          val reduced = latestPerUser(batch)
          val merged =
            if (hasLatest)
              latestPerUser(Dml.readLatest(s, dir)
                .unionByName(reduced))
            else reduced
          // version names stay monotonic even when a NEW checkpoint
          // restarts ids below the committed pointer (committed dirs are
          // immutable — never overwrite one)
          val vid = math.max(id, committedId + 1)
          merged.write.mode("overwrite").parquet(s"$dir/v$vid")
          Dml.commit(dir, s"v$vid")
          writeBatchMark(dir, chkId, id)
        }
        ()
      }
      .option("checkpointLocation", s"$dir/_chk")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    Dml.readLatest(spark, dir)
  }

  /** Stable query id of the checkpoint under `$dir/_chk` — written once
    * by Spark at `metadata` as `{"id":"<uuid>"}` when the checkpoint is
    * created, preserved across restarts, regenerated only when the
    * checkpoint directory itself is recreated. That makes it exactly the
    * lineage token the replay guard needs. */
  private def checkpointQueryId(dir: String): String = {
    val p = java.nio.file.Paths.get(dir, "_chk", "metadata")
    if (!java.nio.file.Files.exists(p)) "none"
    else {
      val txt = java.nio.file.Files.readString(p)
      """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
        .map(_.group(1)).getOrElse("none")
    }
  }

  /** `(checkpointQueryId, batchId)` of the last MERGED batch, recorded at
    * `$dir/_latest_batch` alongside the version pointer (same temp-file +
    * atomic-rename protocol). */
  private def readBatchMark(dir: String): Option[(String, Long)] = {
    val p = java.nio.file.Paths.get(dir, "_latest_batch")
    if (!java.nio.file.Files.exists(p)) None
    else java.nio.file.Files.readString(p).trim.split(':') match {
      case Array(cid, b) => b.toLongOption.map(cid -> _)
      case _ => None
    }
  }

  private def writeBatchMark(dir: String, chkId: String, id: Long): Unit = {
    val tmp = java.nio.file.Paths.get(dir, s"_latest_batch.tmp")
    java.nio.file.Files.writeString(tmp, s"$chkId:$id")
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(dir, "_latest_batch"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** STREAMING MV MAINTENANCE — foreachBatch drives
    * [[Mv.refreshIncremental]]'s O(delta) fold so a file-source stream
    * keeps a registered summary fresh batch-by-batch: each micro-batch
    * lands in the MV's registered base directory under DETERMINISTIC
    * file names, then the refresh folds exactly the just-landed files
    * into the summary. At 100 TB this is the ingest-native MV story —
    * per batch the work is O(batch) write + O(delta + MV) fold, the
    * fact is never rescanned, and every dashboard aggregate keeps
    * reading the summary between batches. Returns the per-batch
    * (delta files folded, total base files) readouts.
    *
    * CRASH REPLAY (foreachBatch is at-least-once): a plain parquet
    * append would re-append a replayed batch's rows — duplicate base
    * rows no fold can undo. Two guards compose:
    *  - the (checkpoint id, batch id) mark protocol of [[upsertedLatest]]
    *    skips a batch whose fold already committed;
    *  - inside the unmarked window, the batch stages to an
    *    overwrite-mode directory and MOVES into the base under
    *    deterministic `b<batch>_<i>.parquet` names with
    *    REPLACE_EXISTING — a replay lands on the SAME names, so the
    *    base never duplicates, and a replaced file whose (len, mtime)
    *    changed after its fold trips the refresh's rebuild path:
    *    correct at full cost, never silently wrong. */
  def maintainMv(
      stream: DataFrame,
      baseDir: String,
      mvName: String,
      dir: String): Seq[(Int, Int)] = {
    import org.apache.spark.sql.streaming.Trigger
    val folds = scala.collection.mutable.Buffer[(Int, Int)]()
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val chkId = checkpointQueryId(dir)
        val isReplay = readBatchMark(dir).exists { case (mid, mbatch) =>
          mid == chkId && mbatch >= id }
        if (isReplay) {
          System.err.println(
            s"[maintainMv] skipping replayed batch $id " +
              s"(checkpoint $chkId already folded it)")
        } else {
          val stage = s"$dir/stage_b$id"
          batch.write.mode("overwrite").parquet(stage)
          val parts = new java.io.File(stage).listFiles()
            .filter(f => f.isFile && f.getName.endsWith(".parquet"))
            .sortBy(_.getName)
          parts.zipWithIndex.foreach { case (f, i) =>
            java.nio.file.Files.move(f.toPath,
              java.nio.file.Paths.get(baseDir, s"b${id}_$i.parquet"),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
          Layouts.deleteDir(batch.sparkSession, stage)
          folds += Mv.refreshIncremental(batch.sparkSession, mvName)
          writeBatchMark(dir, chkId, id)
        }
        ()
      }
      .option("checkpointLocation", s"$dir/_chk")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    folds.toSeq
  }

  /** Streaming exact dedup — the streaming twin of [[Dedup.exactGroups]]
    * (d01) for a document FIREHOSE: keep the first arrival of each distinct
    * content hash, drop later duplicates. `dropDuplicatesWithinWatermark`
    * keys state on the md5 hash and EVICTS entries once the watermark
    * passes them — state is bounded by the lateness horizon × distinct-doc
    * rate, not by stream length, which is what keeps an unbounded
    * 100 TB/day ingest runnable. (Cross-horizon duplicates re-admit — the
    * standard streaming-dedup contract; exact global dedup is the batch
    * d01.) Input needs (ts, text); output is the surviving rows. */
  def dedupStream(docs: DataFrame, lateness: String = "2 hours"): DataFrame =
    docs
      // collision-proof internal key name: a user column named "h" must
      // survive untouched ("output is the surviving rows" = INPUT schema)
      .withColumn("__graft_dedup_h", md5(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("__graft_dedup_h")
      .drop("__graft_dedup_h")

  /** Streaming INCREMENTAL ingest dedup — the stream-static twin of
    * [[Dedup.incrementalMinhashPairs]] (d10's banded scale path) for a
    * document FIREHOSE arriving against a stored corpus: each micro-batch
    * computes signatures per-row (stateless), bands, equi-joins the
    * STATIC banded corpus index on the band key, and verifies candidates
    * with exact jaccard over the cross-side shingle sets. Emits
    * (window start, new_id, old_id, jac) per verified near-dup pair.
    *
    * Scale/state: the signature+banding work is per-row; the
    * stream-static join is STATELESS (re-planned per micro-batch, served
    * from the persisted index frames). The persist PINS the corpus
    * snapshot — unlike the uncached [[enrichStream]] dimension, new files
    * under the corpus path are NOT picked up while the cache holds; an
    * index refresh means releasing/rebuilding the cached frames (the
    * batch pipeline's index-maintenance job) and restarting the stream
    * from its checkpoint. The only state store is the windowed per-pair
    * dedup that collapses multi-band hits, keyed by (window, pair) and
    * evicted by the watermark — bounded by lateness × pair rate, never
    * stream length. The watermark is declared on the RAW stream before
    * the band join: a filter-then-watermark order would let sparse-match
    * periods (every row dropped by the join) stall the watermark, so
    * append-mode windows would never finalize and state never evict.
    * The corpus-side skew cap and band layout are the shared Dedup
    * helpers (aggregate + broadcast anti-join, never a window over the
    * hot bucket); the index stores (band, bh, old_id) keys SEPARATELY
    * from the per-doc shingle sets, so the heavy sh_b array is cached
    * once per corpus doc, not once per band row. Input needs
    * (ts, doc_id, text); equality with the batch pairs on the same data
    * is asserted in StreamingSpec. */
  def incrementalDedupStream(
      newDocs: DataFrame,
      corpus: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "2 hours",
      shingleN: Int = 3,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    val rows = k / bands
    // the static corpus index: built once, cached, reused every batch —
    // in production these two frames are the stored dedup index the
    // batch pipeline maintains (Dedup.minhashPrep + banding, d10's
    // layout): 3-long-column band keys, and the shingle sets once per doc
    val prepOld = ManagedCache.persist(
      Dedup.minhashPrep(corpus, shingleN, k))
    val index = ManagedCache.persist(
      Dedup.capBanded(Dedup.bandedKeys(prepOld, bands, rows), maxBucket)
        .withColumnRenamed("doc_id", "old_id"))
    val setsOld = prepOld.select(col("doc_id").as("old_id"),
      col("shh").as("sh_b"))
    val streamBanded = newDocs
      .withWatermark("ts", lateness)
      .withColumn("sh_a", TextExpressions.shingleHashes(
        TextFunctions.tokens(col("text")), shingleN))
      .withColumn("sig", TextExpressions.minhashSig(col("sh_a"), k))
      .select(col("ts"), col("doc_id").as("new_id"), col("sh_a"),
        explode(TextFunctions.lshBands(col("sig"), bands, rows)).as("bk"))
      .select(col("ts"), col("new_id"), col("sh_a"),
        col("bk.band").as("band"), col("bk.bh").as("bh"))
    streamBanded.join(index, Seq("band", "bh"))
      .join(setsOld, Seq("old_id"))
      .withColumn("jac",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jac") >= threshold)
      // multi-band hits of the same pair collapse here; jac is identical
      // across them, so first() is deterministic
      .groupBy(window(col("ts"), windowLen).as("w"),
        col("new_id"), col("old_id"))
      .agg(first(col("jac")).as("jac"))
      .select(col("w.start").as("h"), col("new_id"), col("old_id"),
        col("jac"))
  }

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * hand-rolled form of [[sessionStats]] for when session semantics
    * outgrow `session_window` (e.g. per-session custom payloads). Gap
    * semantics match session_window exactly: events merge iff their
    * [t, t+gap) ranges strictly overlap. State per user is ONE open
    * session (constant size); closed sessions are emitted as soon as a
    * gap is observed in-batch, and the final open session is flushed
    * when the event-time watermark passes its timeout — so state is
    * bounded and eventually drained, the property that keeps an
    * unbounded 100 TB/day stream runnable. Cross-batch out-of-order
    * events within the watermark merge by EXTENDING the open session's
    * bounds (min start / max last); an event older than the open
    * session by a full gap emits as its own closed singleton — the
    * constant-state approximation (exact reordering is the batch s04).
    *
    * Caller must `withWatermark("ts", ...)` before `.as[SessionEvent]`.
    * Batch execution note: Spark never fires timeouts in batch mode, so a
    * batch run emits only gap-CLOSED sessions; each user's trailing open
    * session is not emitted (use the batch s04 query for complete batch
    * sessionization — this operator is the streaming form). */
  def sessionizeCustomState(
      events: Dataset[SessionEvent],
      gapSeconds: Long = 1800): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          def close(s: SessionState): ClosedSession = ClosedSession(
            userId,
            new java.sql.Timestamp(s.start * 1000),
            new java.sql.Timestamp(s.lastTs * 1000),
            s.n)
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap: the open session is final
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime / 1000
              open match {
                // within the gap on EITHER side of the open session:
                // merge, extending both bounds — a late-but-in-watermark
                // event from a previous batch may precede the open
                // session's start, and naively assigning lastTs = t would
                // move lastTs BACKWARD, yielding end < start and a
                // premature timeout (in-batch sorting cannot protect
                // across batches). Strict < matches session_window, which
                // merges only strictly-overlapping [t, t+gap) ranges.
                case Some(s) if t > s.start - gapSeconds &&
                    t - s.lastTs < gapSeconds =>
                  open = Some(s.copy(
                    start = math.min(s.start, t),
                    lastTs = math.max(s.lastTs, t),
                    n = s.n + 1))
                case Some(s) if t <= s.start - gapSeconds =>
                  // older than the open session by a full gap: its own
                  // already-over session (anything that could still merge
                  // with it is inside the watermark by at most the
                  // lateness bound; emitting it closed is the constant-
                  // state approximation — exact reordering needs the
                  // batch s04 pipeline)
                  closed += ClosedSession(
                    userId, new java.sql.Timestamp(t * 1000),
                    new java.sql.Timestamp(t * 1000), 1)
                case Some(s) =>
                  closed += close(s)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastTs + gapSeconds) * 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming per-domain quota — t33's ingest-time face: admit at most
    * `cap` documents per registered domain and emit each admitted doc
    * with its 1-based admission rank. State per domain is ONE long (the
    * admitted count), carried across micro-batches: a domain that
    * exhausts its quota in batch k admits nothing in batch k+1, without
    * any corpus rescan — the crawl-frontier budget enforcement that
    * batch t33 can only apply after the fact.
    *
    * Determinism: within each micro-batch the group is ranked by the
    * content-keyed (rk_key, doc_id) order (t33's md5 rule), so a single
    * AvailableNow batch reproduces t33's global ranking exactly — the
    * property the s24 gate checks. Across batches admission becomes
    * arrival-order (batch k admits before anything in batch k+1), which
    * IS the production frontier semantics: a quota is a running budget,
    * not a retrospective top-k. The in-batch sort buffers one group of
    * one micro-batch (bounded by trigger sizing, same contract as
    * sessionizeCustomState's per-group sort); drop the sort for pure
    * arrival-order admission at zero buffering. */
  def domainCapStream(docs: Dataset[DomainDoc], cap: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.domain)
      .flatMapGroupsWithState[Long, CappedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, rows: Iterator[DomainDoc],
         state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(cap - admitted, 0L).toInt
          val out = rows.toSeq.sortBy(r => (r.rk_key, r.doc_id))
            .take(room).zipWithIndex.map { case (r, i) =>
              CappedDoc(r.doc_id, domain, (admitted + i + 1).toInt)
            }
          state.update(admitted + out.size)
          out.iterator
      }
      .toDF()
  }

  /** s31: per-user running totals via `transformWithState` — Spark 4's
    * arbitrary-state operator (SPARK-46815), the successor to
    * [[sessionizeCustomState]]'s `flatMapGroupsWithState`: named state
    * variables (`ValueState`/`ListState`/`MapState`) with per-variable
    * TTL, event/processing-time timers, and schema evolution of state,
    * all backed by the RocksDB state store (the operator REQUIRES it —
    * state lives off-heap with changelog checkpointing, which is what
    * makes per-key state viable when the key space is 100 TB-corpus
    * sized rather than memory-sized). Each micro-batch emits one row
    * per ACTIVE user carrying that batch's event count plus the
    * running (cumulative) count and event_id checksum from state —
    * the cross-batch persistence is the semantics under test; integer
    * sums keep the readout bit-exact cross-engine. */
  def runningTotals(events: Dataset[KeyedEvent]): Dataset[UserBatchTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Append)
  }

  /** s38: per-user TRAILING-K event window via `transformWithState`
    * LIST STATE — the state shape [[runningTotals]]' ValueState can't
    * express: an ordered, bounded collection per key (the "last k
    * events per user" every feature store / abuse monitor keeps).
    * Each batch appends that batch's ids IN A DEFINED ORDER (sorted —
    * micro-batch row order is partition-arbitrary, so determinism
    * must come from the processor), trims the list to its last k with
    * one put(), and emits the settled window's exact-integer summary.
    * ListState is the right tool precisely because the store trims
    * IN PLACE: the untrimmed history never accumulates, so per-key
    * state is O(k) forever — the property that makes trailing windows
    * viable over a 100 TB-corpus-sized key space on RocksDB. */
  def trailingEvents(
      events: Dataset[KeyedEvent], k: Int = 3): Dataset[UserTrailing] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TrailingEventsProcessor(k),
        TimeMode.None(), OutputMode.Append)
  }

  /** s39: per-user per-event-type counters via `transformWithState`
    * MAP STATE — the third and last state-variable shape (ValueState
    * s31, ListState s38): a keyed sub-map per user, point-updatable
    * without rewriting the whole value (the property that matters when
    * a user's map holds thousands of counters — RocksDB stores each
    * map entry as its own KV pair, so one event touches one entry).
    * Emits the settled cumulative readout per active user per batch:
    * distinct types seen, total events, and the majority type
    * (max count, ties to the lexicographically smallest — the g13
    * tie discipline). */
  def typeCounts(events: Dataset[TypedEvent]): Dataset[UserTypeCounts] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor,
        TimeMode.None(), OutputMode.Append)
  }

  /** s33: inactivity finalization via `transformWithState` EVENT-TIME
    * TIMERS — the API half [[runningTotals]] doesn't touch. Each event
    * updates the user's (count, last-seen) state and re-arms a timer at
    * `last_ts + gap`; when the event-time watermark passes the timer,
    * `handleExpiredTimer` emits the final summary and clears the state.
    * This is the timer-driven form of session/activity closure: emission
    * is driven by WATERMARK PROGRESS, not by the user's next event — a
    * user who goes quiet forever still finalizes (the thing a pure
    * input-driven processor can never do), and cleared state is what
    * bounds the key space on an unbounded firehose. Caller must
    * `withWatermark` on `ts` before grouping (EventTime mode requires
    * it). */
  def inactivityFinalize(
      events: Dataset[TimedEvent],
      gapSeconds: Long = 7200): Dataset[UserFinal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new InactivityFinalizeProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append)
  }
}

/** Input row for [[EventStreams.runningTotals]]. */
case class KeyedEvent(user_id: Long, event_id: Long)

/** Cross-batch state of [[RunningTotalsProcessor]]: cumulative event
  * count and event_id checksum for one user. */
case class RunningState(n: Long, idSum: Long)

/** One output row per (user, micro-batch-where-user-appeared). */
case class UserBatchTotals(
    user_id: Long,
    batch_events: Long,
    cum_events: Long,
    cum_id_sum: Long)

/** Input row for [[EventStreams.inactivityFinalize]]. */
case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)

/** Per-user state for [[InactivityFinalizeProcessor]]: event count, last
  * event time (ms), and the currently registered timer's expiry (so the
  * next event can delete-then-re-register — the handle has no
  * replace-timer op). */
case class InactivityState(n: Long, lastMs: Long, timerMs: Long)

/** Typed row for [[EventStreams.typeCounts]]. */
case class TypedEvent(user_id: Long, event_id: Long, event_type: String)

/** Per-(user, batch) cumulative type-counter readout ([[EventStreams
  * .typeCounts]]). */
case class UserTypeCounts(
    user_id: Long,
    batch: Long,
    n_types: Long,
    cum_n: Long,
    top_type: String)

/** The MapState processor behind [[EventStreams.typeCounts]]: one named
  * `MapState[String, Long]` per user; each input row point-increments
  * its type's entry. The majority readout iterates the map — O(types
  * per user), not O(events). */
class TypeCountsProcessor
    extends StatefulProcessor[Long, TypedEvent, UserTypeCounts] {
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "counts", org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[TypedEvent],
      timerValues: TimerValues): Iterator[UserTypeCounts] = {
    var batch = -1L
    rows.foreach { e =>
      batch = e.event_id % 2
      val cur = if (counts.containsKey(e.event_type))
        counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, cur + 1L)
    }
    val m = counts.iterator().toArray
    val total = m.map(_._2).sum
    val top = m.sortBy { case (t, c) => (-c, t) }.head._1
    Iterator.single(
      UserTypeCounts(key, batch, m.length.toLong, total, top))
  }
}

/** Per-(user, batch) settled trailing-window summary ([[EventStreams
  * .trailingEvents]]): `batch` is the shared parity of the batch's
  * constructed ids; the window stats are exact integers. */
case class UserTrailing(
    user_id: Long,
    batch: Long,
    n_recent: Long,
    min_r: Long,
    max_r: Long,
    sum_r: Long)

/** The ListState processor behind [[EventStreams.trailingEvents]]: one
  * named `ListState[Long]` per user holding AT MOST k ids in arrival
  * order. Batch rows are sorted before appending (micro-batch row order
  * is partition-arbitrary; determinism is the processor's job), then
  * the list is re-put() as its own last k — the in-place trim that
  * keeps per-key state O(k). */
class TrailingEventsProcessor(k: Int)
    extends StatefulProcessor[Long, KeyedEvent, UserTrailing] {
  @transient private var recent: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[Long](
      "recent", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[KeyedEvent],
      timerValues: TimerValues): Iterator[UserTrailing] = {
    val ids = rows.map(_.event_id).toArray.sorted
    val batch = ids.head % 2
    val all = (recent.get().toArray ++ ids).takeRight(k)
    recent.put(all)
    Iterator.single(UserTrailing(
      key, batch, all.length.toLong, all.min, all.max, all.sum))
  }
}

/** Finalized activity summary emitted when a user's inactivity timer
  * fires. */
case class UserFinal(
    user_id: Long,
    n_events: Long,
    last_ts: java.sql.Timestamp)

/** The `StatefulProcessor` behind [[EventStreams.runningTotals]]: one
  * named `ValueState[RunningState]` per user, no TTL (`TTLConfig.NONE` —
  * a production quota would bound it), no timers (`TimeMode.None`). The
  * handle is only valid from `init` onward, hence the transient var. */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, KeyedEvent, UserBatchTotals] {
  @transient private var totals: ValueState[RunningState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[RunningState](
      "totals", org.apache.spark.sql.Encoders.product[RunningState],
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[KeyedEvent],
      timerValues: TimerValues): Iterator[UserBatchTotals] = {
    var n = 0L
    var s = 0L
    rows.foreach { e => n += 1; s += e.event_id }
    val prev = if (totals.exists()) totals.get() else RunningState(0L, 0L)
    val cur = RunningState(prev.n + n, prev.idSum + s)
    totals.update(cur)
    Iterator.single(UserBatchTotals(key, n, cur.n, cur.idSum))
  }
}

/** The timer-driven processor behind [[EventStreams.inactivityFinalize]]:
  * input rows only mutate state and re-arm the per-key timer (delete old,
  * register `last + gap` — Spark processes a batch's input rows BEFORE
  * expiring timers, so an in-batch event always wins the race against its
  * own stale timer); all OUTPUT happens in `handleExpiredTimer`, which
  * reads the final state, emits one summary row, and clears both state
  * and (already-fired) timer. */
class InactivityFinalizeProcessor(gapSeconds: Long)
    extends StatefulProcessor[Long, TimedEvent, UserFinal] {
  @transient private var st: ValueState[InactivityState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[InactivityState](
      "activity", org.apache.spark.sql.Encoders.product[InactivityState],
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[TimedEvent],
      timerValues: TimerValues): Iterator[UserFinal] = {
    var n = 0L
    var last = Long.MinValue
    rows.foreach { e => n += 1; last = math.max(last, e.ts.getTime) }
    val prev = if (st.exists()) st.get()
      else InactivityState(0L, Long.MinValue, Long.MinValue)
    val merged = InactivityState(
      prev.n + n, math.max(prev.lastMs, last), prev.timerMs)
    val expiry = merged.lastMs + gapSeconds * 1000
    if (prev.timerMs != Long.MinValue && prev.timerMs != expiry)
      getHandle.deleteTimer(prev.timerMs)
    if (prev.timerMs != expiry) getHandle.registerTimer(expiry)
    st.update(merged.copy(timerMs = expiry))
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[UserFinal] = {
    val out = if (st.exists()) {
      val s = st.get()
      Iterator.single(UserFinal(key, s.n, new java.sql.Timestamp(s.lastMs)))
    } else Iterator.empty
    st.clear()
    out
  }
}
