package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Evt(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Structured Streaming twins ([[EventStreams]]) driven by a MemoryStream:
  * asserts incremental windowed aggregation matches the batch semantics. */
class StreamingSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  private val fixture = Seq(
    Evt(1, t("2026-01-01 10:05:00"), 1, "click", 1.0),
    Evt(2, t("2026-01-01 10:20:00"), 1, "click", 2.0),
    Evt(3, t("2026-01-01 10:40:00"), 2, "view", 3.0),
    Evt(4, t("2026-01-01 11:10:00"), 1, "click", 4.0),
    // > 30 min after event 2 for user 1 -> second session
    Evt(5, t("2026-01-01 12:00:00"), 2, "view", 5.0))

  test("streaming hourly agg matches the batch twin on the same data") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val query = EventStreams.hourlyAgg(ms.toDF)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      ms.addData(fixture)
      query.processAllAvailable()
      val got = spark.table("hourly_out")
        .orderBy("h", "event_type").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3)))
      val batch = fixture.toDF()
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
        .orderBy("h", "event_type").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3)))
      assert(got.toSeq == batch.toSeq)
    } finally query.stop()
  }

  test("streaming sessionization: 30-min gap splits user 1 into 2 sessions") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val query = EventStreams.sessionStats(ms.toDF)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      ms.addData(fixture)
      query.processAllAvailable()
      val got = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(3)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      // user 1: events at 10:05/10:20 then 11:10 -> sessions of 2 and 1
      assert(got(1L) == Seq(1L, 2L))
      // user 2: 10:40 and 12:00 -> two singleton sessions
      assert(got(2L) == Seq(1L, 1L))
    } finally query.stop()
  }

  test("custom-state sessionization: in-batch gaps close sessions " +
    "immediately; the watermark drains the final open session") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[SessionEvent]
    val stream = EventStreams.sessionizeCustomState(
      ms.toDF.withWatermark("ts", "0 seconds").as[SessionEvent])
    val query = stream.writeStream.format("memory").queryName("cs_out")
      .outputMode("append").start()
    try {
      // batch 1: two sessions for user 1 (gap > 30 min splits in-batch)
      ms.addData(
        SessionEvent(1, t("2026-01-01 10:00:00"), 1, "c", 1.0),
        SessionEvent(2, t("2026-01-01 10:10:00"), 1, "c", 1.0),
        SessionEvent(3, t("2026-01-01 11:00:00"), 1, "c", 1.0))
      query.processAllAvailable()
      val early = spark.table("cs_out").as[ClosedSession].collect()
      assert(early.length == 1 && early.head.n_events == 2)
      // batch 2 advances max event time; batch 3 advances the watermark
      // past 11:00 + 30 min -> the open session times out and flushes
      ms.addData(SessionEvent(4, t("2026-01-01 13:00:00"), 2, "c", 1.0))
      query.processAllAvailable()
      ms.addData(SessionEvent(5, t("2026-01-01 13:05:00"), 2, "c", 1.0))
      query.processAllAvailable()
      val all = spark.table("cs_out").as[ClosedSession].collect()
      val u1 = all.filter(_.user_id == 1)
      assert(u1.length == 2, s"got ${all.toSeq}")
      assert(u1.map(_.n_events).sorted.toSeq == Seq(1L, 2L))
    } finally query.stop()
  }

  test("custom-state sessionization in batch emits exactly the gap-closed " +
    "sessions (batch never fires timeouts, so open tails stay in state)") {
    val sq = spark; import sq.implicits._
    val batch = EventStreams.sessionizeCustomState(
      fixture.map(e =>
        SessionEvent(e.event_id, e.ts, e.user_id, e.event_type, e.value))
        .toDS())
    val perUser = batch.collect().groupBy(_.user_id)
      .view.mapValues(_.map(_.n_events).sum).toMap
    // user 1: 10:05/10:20 closed by the 11:10 gap (2 events); 11:10 stays
    // open. user 2: 10:40 closed by the 12:00 gap; 12:00 stays open.
    assert(perUser == Map(1L -> 2L, 2L -> 1L))
  }

  test("streaming dedup keeps the first arrival of each content hash " +
    "across micro-batches (d01's streaming twin)") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = EventStreams.dedupStream(ms.toDF.toDF("doc_id", "ts", "text"))
    // "output is the surviving rows": the internal md5 key column must
    // not leak into the downstream schema
    assert(out.columns.toSeq == Seq("doc_id", "ts", "text"))
    val query = out
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData(Seq(
        (1L, t("2026-01-01 10:00:00"), "alpha beta"),
        (2L, t("2026-01-01 10:01:00"), "alpha beta"), // in-batch dup
        (3L, t("2026-01-01 10:02:00"), "gamma")))
      query.processAllAvailable()
      ms.addData(Seq(
        (4L, t("2026-01-01 10:30:00"), "gamma"), // cross-batch dup
        (5L, t("2026-01-01 10:31:00"), "delta")))
      query.processAllAvailable()
      val survivors = spark.table("dedup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(survivors == Set(1L, 3L, 5L),
        s"got $survivors — duplicates 2 (in-batch) and 4 (cross-batch) " +
          "must drop within the watermark horizon")
    } finally query.stop()
  }

  test("streaming trending terms matches the batch explode+count on the " +
    "same data (t07's windowed twin)") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val query = EventStreams.trendingTerms(ms.toDF.toDF("ts", "text"))
      .writeStream.format("memory").queryName("trend_out")
      .outputMode("complete").start()
    try {
      ms.addData(Seq(
        (t("2026-01-01 10:05:00"), "spark spark scan"),
        (t("2026-01-01 10:40:00"), "scan filter"),
        (t("2026-01-01 11:10:00"), "spark")))
      query.processAllAvailable()
      val got = spark.table("trend_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(got == Set(
        ("2026-01-01 10:00:00.0", "spark", 2L),
        ("2026-01-01 10:00:00.0", "scan", 2L),
        ("2026-01-01 10:00:00.0", "filter", 1L),
        ("2026-01-01 11:00:00.0", "spark", 1L)))
    } finally query.stop()
  }

  test("stream-static enrichment joins each micro-batch against the " +
    "broadcast dimension, stateless (unmatched keys keep null attrs)") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val ms = MemoryStream[Evt]
    val query = EventStreams.enrichStream(ms.toDF, dim, "user_id")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      ms.addData(fixture :+ Evt(9, t("2026-01-01 12:30:00"), 7, "view", 0.0))
      query.processAllAvailable()
      val got = spark.table("enrich_out").collect()
        .map(r => (r.getLong(0), Option(r.getString(2)))).toMap
      assert(got(1L) == Some("gold") && got(3L) == Some("silver") &&
        got(9L) == None)
    } finally query.stop()
  }

  test("user activity rollup is streaming-queryable (update-mode state)") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val query = EventStreams.userActivity(ms.toDF)
      .writeStream.format("memory").queryName("act_out")
      .outputMode("complete").start()
    try {
      ms.addData(fixture)
      query.processAllAvailable()
      val got = spark.table("act_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got(1L) == ((3L, 7.0)))
      assert(got(2L) == ((2L, 8.0)))
    } finally query.stop()
  }

  test("EXECUTED gate: file-source streaming hourlyAgg (AvailableNow) " +
    "equals the batch s01 answer on the real events fixture") {
    // not MemoryStream synthetic rows: the s07 catalog entry streams the
    // driver's events parquet through EventStreams.hourlyAgg and must
    // reproduce the batch twin's result set exactly
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    val streamed = rows(q("s07_stream_hourly_agg").build(spark, sf))
    val batch = rows(q("s01_hourly_agg").build(spark, sf))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("EXECUTED gate: file-source streaming sessionization (AvailableNow) " +
    "equals batch session_window on the real events fixture") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    val viewsBefore = spark.catalog.listTables().count()
    val streamed = rows(q("s08_stream_sessionize").build(spark, sf))
    // the internal memory-sink view must not leak into the catalog
    assert(spark.catalog.listTables().count() == viewsBefore,
      "drainStream leaked its sink temp view")
    // session_window is equally a batch aggregation — same operator, no
    // stream: the executed stream must reproduce it exactly
    val batch = rows(Tables.t(spark, sf, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start"), col("w.end"), col("n_events")))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stream-static incremental dedup equals the batch incremental " +
    "pairs on the same delta-vs-corpus split (jac included)") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    ManagedCache.releaseAll()
    // doc_id predicate, not limit(n): an unordered limit over a
    // multi-partition scan has no guaranteed row set, and the delta is
    // collected once for the stream while the batch side re-executes
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 200)
    val deltaRows = docs.filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text").collect()
      .map(r => (t("2026-01-01 10:05:00"), r.getLong(0), r.getString(1)))
    val rest = docs.filter(col("doc_id") % 10 =!= 0)
    val ms = MemoryStream[(Timestamp, Long, String)]
    val query = EventStreams.incrementalDedupStream(
      ms.toDF.toDF("ts", "doc_id", "text"), rest,
      bands = 8, threshold = 0.5)
      .writeStream.format("memory").queryName("incdedup_out")
      .outputMode("complete").start()
    try {
      ms.addData(deltaRows.toSeq)
      query.processAllAvailable()
      val streamed = spark.table("incdedup_out").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = Dedup.incrementalMinhashPairs(
        docs.filter(col("doc_id") % 10 === 0), rest,
        bands = 8, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(streamed.nonEmpty && streamed == batch)
      // every streamed pair landed in the single event-time window
      val hours = spark.table("incdedup_out").collect()
        .map(_.getTimestamp(0).toString).toSet
      assert(hours == Set("2026-01-01 10:00:00.0"))
    } finally {
      query.stop()
      ManagedCache.releaseAll()
    }
  }

  test("checkpointed file-sink stream processes each input file exactly " +
    "once across restarts (offset tracking + exactly-once sink)") {
    import java.nio.file.{Files, Paths, Path}
    import org.apache.spark.sql.streaming.Trigger
    def tmp(p: String): Path = {
      val d = Files.createTempDirectory(p); d.toFile.deleteOnExit(); d
    }
    val in = tmp("graft_ckpt_in")
    val out = tmp("graft_ckpt_out")
    val ckpt = tmp("graft_ckpt_state")
    val src = Paths.get(s"$sf/documents.parquet")
    val schema = spark.read.parquet(src.toString).schema
    val nDocs = spark.read.parquet(src.toString).count()
    def drain(): Unit = {
      // the production shape: file source -> stateless scrub -> parquet
      // sink with a REAL checkpoint (not the memory-sink test harness)
      val q = TextQueries.piiScrubbed(
        spark.readStream.schema(schema).parquet(in.toString))
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    Files.copy(src, in.resolve("batch1.parquet"))
    drain()
    assert(spark.read.parquet(out.toString).count() == nDocs)
    // restart with NO new input: the checkpoint must prevent reprocessing
    drain()
    assert(spark.read.parquet(out.toString).count() == nDocs,
      "restart without new files must not re-emit processed rows")
    // a new file arrives: only the delta is processed
    Files.copy(src, in.resolve("batch2.parquet"))
    drain()
    val res = spark.read.parquet(out.toString)
    assert(res.count() == 2 * nDocs)
    // each doc_id seen exactly twice - once per input file, never more
    assert(res.groupBy("doc_id").count()
      .filter(col("count") =!= 2).count() == 0)
  }

  test("stream-stream attribution join matches a buffered view from an " +
    "EARLIER micro-batch and respects the interval bound") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Evt]
    val query = EventStreams.attributionJoin(ms.toDF)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // batch 1: a view only — no output yet, the view enters join state
      ms.addData(Evt(1, t("2026-01-01 10:00:00"), 7, "view", 0.0))
      query.processAllAvailable()
      assert(spark.table("attr_out").count() == 0)
      // batch 2: a purchase 30 min later (inside 2 h) matches the
      // BUFFERED view; one outside the window and one for another user
      // must not
      ms.addData(
        Evt(2, t("2026-01-01 10:30:00"), 7, "purchase", 9.99),
        Evt(3, t("2026-01-01 13:00:00"), 7, "purchase", 1.0), // > 2 h
        Evt(4, t("2026-01-01 10:31:00"), 8, "purchase", 2.0)) // other user
      query.processAllAvailable()
      val got = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getDouble(3)))
      assert(got.toSeq == Seq(
        (7L, t("2026-01-01 10:00:00"), t("2026-01-01 10:30:00"), 9.99)))
    } finally query.stop()
  }

  test("foreachBatch upsert commits a latest-per-user table that is " +
    "incremental across stream restarts and equals the one-shot batch " +
    "argmax (merge associativity)") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("s16spec").toString
    val ms = MemoryStream[Evt]
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id").collect().map(r => (r.getLong(0),
        r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    // first drain: events 1-3 only
    ms.addData(fixture.take(3))
    val t1 = rows(EventStreams.upsertedLatest(spark, ms.toDF, dir))
    assert(t1.toSeq == Seq(
      (1L, t("2026-01-01 10:20:00"), 2L, "click", 2.0),
      (2L, t("2026-01-01 10:40:00"), 3L, "view", 3.0)))
    // restart over the SAME dir: the checkpoint replays nothing, the new
    // events fold into the committed table (the incremental-ingest shape)
    ms.addData(fixture.drop(3))
    val t2 = rows(EventStreams.upsertedLatest(spark, ms.toDF, dir))
    assert(t2.toSeq == Seq(
      (1L, t("2026-01-01 11:10:00"), 4L, "click", 4.0),
      (2L, t("2026-01-01 12:00:00"), 5L, "view", 5.0)))
    // and the settled table equals the single-pass batch reduction
    assert(t2.toSeq ==
      rows(EventStreams.latestPerUser(fixture.toDF)).toSeq)
  }

  test("foreachBatch upsert survives a crash-replay: a batch whose merge " +
    "committed but whose checkpoint commit was lost is SKIPPED on " +
    "restart, not re-merged into a path being read") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("s16replay").toString
    val ms = MemoryStream[Evt]
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id").collect().map(r => (r.getLong(0),
        r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    ms.addData(fixture)
    val settled = rows(EventStreams.upsertedLatest(spark, ms.toDF, dir))
    // simulate the crash window ADVICE flagged: Dml.commit(dir, vN)
    // succeeded but the streaming checkpoint's OWN commit for batch N was
    // lost — delete the newest checkpoint commit marker, forcing a replay
    // of that batch on the next start. Without the replay guard this
    // wedged permanently: the replayed merge read _latest (= vN) while
    // overwrite-writing the same $dir/vN path.
    val commits = java.nio.file.Paths.get(dir, "_chk", "commits")
    val newest = java.nio.file.Files.list(commits).toArray
      .map(_.toString).filter(!_.endsWith(".crc"))
      .maxBy(p => p.split('/').last.toLong)
    java.nio.file.Files.delete(java.nio.file.Paths.get(newest))
    // the Hadoop checksum sidecar must go with it, or the re-written
    // commit marker fails its .crc rename
    val crc = java.nio.file.Paths.get(commits.toString,
      "." + newest.split('/').last + ".crc")
    java.nio.file.Files.deleteIfExists(crc)
    val replayed = rows(EventStreams.upsertedLatest(spark, ms.toDF, dir))
    assert(replayed.toSeq == settled.toSeq)
    assert(replayed.toSeq ==
      rows(EventStreams.latestPerUser(fixture.toDF)).toSeq)
  }

  test("checkpoint-identity guard: a RECREATED checkpoint over a " +
    "surviving committed store merges new data instead of silently " +
    "skipping restarted batch ids (ADVICE replay-guard hole)") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("s16chkid").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id").collect().map(r => (r.getLong(0),
        r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val ms = MemoryStream[Evt]
    ms.addData(fixture)
    rows(EventStreams.upsertedLatest(spark, ms.toDF, dir))
    // ops incident: the checkpoint directory is lost and recreated while
    // `_latest` survives — batch ids restart at 0, which a bare
    // `committedId >= id` guard mistakes for an already-merged replay
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$dir/_chk"))
    val ms2 = MemoryStream[Evt]
    ms2.addData(Seq(Evt(9, t("2026-01-01 15:00:00"), 1, "buy", 9.0)))
    val merged = rows(EventStreams.upsertedLatest(spark, ms2.toDF, dir))
    assert(merged.toSeq == Seq(
      (1L, t("2026-01-01 15:00:00"), 9L, "buy", 9.0),
      (2L, t("2026-01-01 12:00:00"), 5L, "view", 5.0)),
      "new data after checkpoint recreation must merge, not be skipped")
    // committed version dirs stayed immutable: the new commit landed on
    // a version ABOVE the old pointer, not over a published directory
    assert(Dml.currentVersion(dir).stripPrefix("v").toLong >= 1L)
  }

  test("streaming domain cap: the quota is a running budget across " +
    "micro-batches — batch 2 admits only the remaining room, an " +
    "exhausted domain admits nothing, ranks continue where they left off") {
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[DomainDoc]
    val query = EventStreams.domainCapStream(ms.toDS(), cap = 3)
      .writeStream.format("memory").queryName("cap_out")
      .outputMode("append").start()
    try {
      // batch 1: a.com sends 2 (both admitted, ranked by rk_key not
      // arrival: k2 < k9), b.org sends 3 (fills its quota exactly)
      ms.addData(Seq(
        DomainDoc(1L, "a.com", "k9"), DomainDoc(2L, "a.com", "k2"),
        DomainDoc(3L, "b.org", "k1"), DomainDoc(4L, "b.org", "k3"),
        DomainDoc(5L, "b.org", "k5")))
      query.processAllAvailable()
      // batch 2: a.com has room for ONE more (doc 7 wins on rk_key);
      // b.org is exhausted and admits nothing
      ms.addData(Seq(
        DomainDoc(6L, "a.com", "k8"), DomainDoc(7L, "a.com", "k4"),
        DomainDoc(8L, "b.org", "k0")))
      query.processAllAvailable()
      val got = spark.table("cap_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .toSet
      assert(got == Set(
        (2L, "a.com", 1), (1L, "a.com", 2),   // batch-1 md5-order ranks
        (3L, "b.org", 1), (4L, "b.org", 2), (5L, "b.org", 3),
        (7L, "a.com", 3)),                    // batch-2 continues at 3
        s"got $got")
    } finally query.stop()
  }

  test("s29 late-data semantics: a row drops only when its WINDOW has " +
    "closed, not merely when its timestamp trails the watermark; the " +
    "drop is visible in the state-operator metrics") {
    import org.apache.spark.sql.streaming.Trigger
    val sq = spark; import sq.implicits._
    val dir = Dml.work("s29spec", sf) + "_landing"
    def t(sec: Long) = new Timestamp((1767225600L + sec) * 1000)
    // batch 0: one row each in hours 0,1,2; max ts 02:10 -> wm = 02:10
    val a = Seq((0L, t(600)), (2L, t(3600 + 600)),
      (4L, t(2 * 3600 + 600))).toDF("event_id", "ts")
    // batch 1: 02:05 — behind the watermark but hour-2 window still
    // open: KEPT (lateness is judged by window end, not timestamp)
    val b = Seq((3L, t(2 * 3600 + 300))).toDF("event_id", "ts")
    // batch 2: 00:40 — hour-0 closed (and the close is a full batch
    // old, so the SPARK-40925 previous-watermark late filter sees it):
    // DROPPED; 03:05 advances the final watermark, own window unclosed
    val c = Seq((1L, t(2400)), (5L, t(3 * 3600 + 300)))
      .toDF("event_id", "ts")
    EventStreams.writeBatchLanding(spark, dir, Seq(a, b, c))
    val stream = spark.readStream.schema(a.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val sink = "s29spec_out"
    val q = EventStreams.lateWindowCounts(stream).writeStream
      .format("memory").queryName(sink).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val nBatches = q.recentProgress.count(_.numInputRows > 0)
    val got = spark.table(sink).collect()
      .map(r => ((r.getTimestamp(0).getTime / 1000 - 1767225600L) / 3600,
        r.getLong(1))).toMap
    spark.catalog.dropTempView(sink)
    assert(nBatches == 3, s"expected 3 data micro-batches, got $nBatches")
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 2L), got.toString)
    val dropped = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    assert(dropped == 1L, s"expected exactly the closed-window row " +
      s"dropped, got $dropped")
  }

  test("s37 chained stateful: a duplicate id arriving a BATCH LATER " +
    "still collapses in the dedup stage before the windowed agg " +
    "counts it; the unclosed tail window is held back") {
    import org.apache.spark.sql.streaming.Trigger
    val sq = spark; import sq.implicits._
    val dir = Dml.work("s37spec", sf) + "_landing"
    def t(sec: Long) = new Timestamp((1767225600L + sec) * 1000)
    // batch 0: ids 1,2 in hour 0 (id 1 twice IN-batch), id 3 in hour 1
    val a = Seq((1L, t(600)), (1L, t(600)), (2L, t(900)),
      (3L, t(3600 + 600))).toDF("event_id", "ts")
    // batch 1: id 3 AGAIN at exactly its 01:10 timestamp — ON the
    // batch-0 watermark, so the late filter (ts < wm) cannot touch it
    // and only the dedup STATE can explain its absence from the count
    // — plus id 9 at 03:05 driving the final watermark
    val b = Seq((3L, t(3600 + 600)), (9L, t(3 * 3600 + 300)))
      .toDF("event_id", "ts")
    EventStreams.writeBatchLanding(spark, dir, Seq(a, b))
    val stream = spark.readStream.schema(a.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val sink = "s37spec_out"
    val q = EventStreams.dedupThenHourlyCounts(stream).writeStream
      .format("memory").queryName(sink).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table(sink).collect()
      .map(r => ((r.getTimestamp(0).getTime / 1000 - 1767225600L) / 3600,
        r.getLong(1))).toMap
    spark.catalog.dropTempView(sink)
    // hour 0 counts ids {1,2} once each; hour 1 counts id 3; the
    // watermark driver's own hour-3 window is unclosed -> absent
    assert(got == Map(0L -> 2L, 1L -> 1L), got.toString)
  }

  test("s38 list state: the trailing window trims IN PLACE at k, a " +
    "later batch slides it (oldest id evicts), and a user absent from " +
    "a batch emits no row for it") {
    import org.apache.spark.sql.streaming.Trigger
    val sq = spark; import sq.implicits._
    val dir = Dml.work("s38spec", sf) + "_landing"
    // batch 0 (evens): user 1 overflows k=3 (5 ids -> keep {6,8,10});
    // user 2 stays under (2 ids). batch 1 (odds): only user 1 -> the
    // window slides to {8,10,3}; user 2 must NOT re-emit.
    val a = Seq((1L, 2L), (1L, 4L), (1L, 6L), (1L, 8L), (1L, 10L),
      (2L, 12L), (2L, 20L)).toDF("user_id", "event_id")
    val b = Seq((1L, 3L)).toDF("user_id", "event_id")
    EventStreams.writeBatchLanding(spark, dir, Seq(a, b))
    val stream = spark.readStream.schema(a.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir).as[KeyedEvent]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val sink = "s38spec_out"
    try {
      val q = EventStreams.trailingEvents(stream).toDF().writeStream
        .format("memory").queryName(sink).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val got = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      assert(got == Map(
        (1L, 0L) -> ((3L, 6L, 10L, 24L)),  // trimmed to {6,8,10}
        (2L, 0L) -> ((2L, 12L, 20L, 32L)), // under k: kept whole
        (1L, 1L) -> ((3L, 3L, 10L, 21L))), // slid to {8,10,3}
        got.toString)
    } finally {
      spark.catalog.dropTempView(sink)
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("s39 map state: counters point-update across batches, a " +
    "frequency tie reads the lexicographically smallest type, and a " +
    "later event flips the majority") {
    import org.apache.spark.sql.streaming.Trigger
    val sq = spark; import sq.implicits._
    val dir = Dml.work("s39spec", sf) + "_landing"
    // batch 0: user 1 has types a/b tied 1:1 -> top 'a' (tie rule);
    // batch 1: one more 'b' -> majority flips to 'b'
    val a = Seq((1L, 2L, "b"), (1L, 4L, "a"))
      .toDF("user_id", "event_id", "event_type")
    val b = Seq((1L, 3L, "b"))
      .toDF("user_id", "event_id", "event_type")
    EventStreams.writeBatchLanding(spark, dir, Seq(a, b))
    val stream = spark.readStream.schema(a.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir).as[TypedEvent]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val sink = "s39spec_out"
    try {
      val q = EventStreams.typeCounts(stream).toDF().writeStream
        .format("memory").queryName(sink).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      val got = spark.table(sink).collect()
        .map(r => r.getLong(1) ->
          ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(got == Map(
        0L -> ((2L, 2L, "a")),  // tie -> lexicographic min
        1L -> ((2L, 3L, "b"))), // majority flipped by the odd batch
        got.toString)
    } finally {
      spark.catalog.dropTempView(sink)
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("s30 outer join: a purchase arriving a BATCH AFTER its view " +
    "matches from state; an unmatched view null-pads only after its " +
    "window provably closed; a tail view stays pending (absent)") {
    import org.apache.spark.sql.streaming.Trigger
    val sq = spark; import sq.implicits._
    def t(sec: Long) = new Timestamp((1767225600L + sec) * 1000)
    val vDir = Dml.work("s30spec_v", sf) + "_landing"
    val bDir = Dml.work("s30spec_b", sf) + "_landing"
    // views, batch 0: u1/u2 at 00:10; u3 at 03:50 (too close to the
    // final global watermark 02:30 -> must stay pending)
    val views = Seq((1L, t(600)), (2L, t(600)), (3L, t(3 * 3600 + 3000)))
      .toDF("user_id", "view_ts")
    // buys, batch 0: an out-of-window early row only; batch 1: u1's
    // matching purchase (cross-batch: u1's view is already in state)
    // and the 02:30 row that drives the buy-side watermark
    val buys0 = Seq((99L, t(60), 0.0))
      .toDF("buy_user", "buy_ts", "buy_value")
    val buys1 = Seq((1L, t(2400), 7.5), (98L, t(2 * 3600 + 1800), 0.0))
      .toDF("buy_user", "buy_ts", "buy_value")
    EventStreams.writeBatchLanding(spark, vDir, Seq(views))
    EventStreams.writeBatchLanding(spark, bDir, Seq(buys0, buys1))
    val vs = spark.readStream.schema(views.schema)
      .option("maxFilesPerTrigger", "1").parquet(vDir)
    val bs = spark.readStream.schema(buys0.schema)
      .option("maxFilesPerTrigger", "1").parquet(bDir)
    val sink = "s30spec_out"
    val q = EventStreams.attributionJoinOuter(vs, bs).writeStream
      .format("memory").queryName(sink).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table(sink).collect().map(r => (r.getLong(0),
      Option(r.getTimestamp(2)).map(_.getTime / 1000 - 1767225600L),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    spark.catalog.dropTempView(sink)
    assert(got == Set(
      (1L, Some(2400L), Some(7.5)),   // matched across batches
      (2L, None, None)),              // closed-window null padding
      got.toString)
  }

  test("s31 transformWithState: ValueState persists across micro-batches " +
    "(RocksDB store) — a both-batch user's second row folds in batch 1; " +
    "a batch-2-only user starts from zero") {
    import org.apache.spark.sql.streaming.Trigger
    val sq = spark; import sq.implicits._
    val dir = Dml.work("s31spec", sf) + "_landing"
    // batch 0: u1 twice (ids 10, 20); batch 1: u1 once (id 30) + u2 (id 5)
    val b0 = Seq((1L, 10L), (1L, 20L)).toDF("user_id", "event_id")
    val b1 = Seq((1L, 30L), (2L, 5L)).toDF("user_id", "event_id")
    EventStreams.writeBatchLanding(spark, dir, Seq(b0, b1))
    val st = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir).as[KeyedEvent]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val sink = "s31spec_out"
    try {
      val q = EventStreams.runningTotals(st).toDF().writeStream
        .format("memory").queryName(sink).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
    val got = spark.table(sink).as[UserBatchTotals].collect().toSet
    spark.catalog.dropTempView(sink)
    assert(got == Set(
      UserBatchTotals(1L, 2L, 2L, 30L),   // batch 0
      UserBatchTotals(1L, 1L, 3L, 60L),   // batch 1: state carried over
      UserBatchTotals(2L, 1L, 1L, 5L)),   // batch 1 only: fresh state
      got.toString)
  }

  test("transformWithState at 1e5 distinct keys: RocksDB state scales " +
    "to a corpus-sized key space — state rows == keys, rocksdb custom " +
    "metrics live in the progress, per-task execution memory bounded " +
    "(r12 verdict item 4)") {
    import org.apache.spark.sql.streaming.Trigger
    val sq = spark; import sq.implicits._
    val keys = 100000L
    val dir = Dml.work("twsscale_spec", sf) + "_landing"
    // two batches × 100k users: every user appears in both, so the
    // second batch's output proves 100k states were persisted and
    // reloaded, not just created
    val b0 = spark.range(keys)
      .select(col("id").as("user_id"), (col("id") * 2).as("event_id"))
    val b1 = spark.range(keys)
      .select(col("id").as("user_id"), (col("id") * 2 + 1).as("event_id"))
    EventStreams.writeBatchLanding(spark, dir, Seq(b0, b1))
    val st = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir).as[KeyedEvent]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val sink = "twsscale_out"
    val peakMem = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) peakMem.getAndUpdate(v =>
          math.max(v, m.peakExecutionMemory))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    var progress: Array[org.apache.spark.sql.streaming
      .StreamingQueryProgress] = Array.empty
    try {
      val q = EventStreams.runningTotals(st).toDF().writeStream
        .format("memory").queryName(sink).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally { progress = q.recentProgress; q.stop() }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
    val out = spark.table(sink)
    // batch 0: every user (1, 1, 2id); batch 1: every user (1, 2, 4id+1)
    assert(out.count() == 2 * keys)
    val settled = out.filter(col("cum_events") === 2)
    assert(settled.count() == keys,
      "every key's state must survive into batch 1")
    assert(settled
      .filter(col("cum_id_sum") =!= col("user_id") * 4 + 1)
      .count() == 0, "cross-batch checksum must fold both events")
    spark.catalog.dropTempView(sink)
    // state-store evidence from the query's own progress: the stateful
    // operator tracked one state row per key, through RocksDB (its
    // custom metrics namespace present), with a live changelog/commit
    val stateProgress = progress.filter(_.stateOperators.nonEmpty)
    assert(stateProgress.nonEmpty, "no stateOperators progress recorded")
    val lastOp = stateProgress.last.stateOperators.head
    assert(lastOp.numRowsTotal == keys,
      s"state rows ${lastOp.numRowsTotal} != $keys keys")
    val custom = lastOp.customMetrics
    import scala.jdk.CollectionConverters._
    val rocksKeys = custom.keySet.asScala.filter(
      _.toLowerCase(java.util.Locale.ROOT).contains("rocksdb"))
    assert(rocksKeys.nonEmpty,
      s"expected rocksdb custom metrics, got ${custom.keySet}")
    // commit work actually flowed through the store
    assert(rocksKeys.exists(k => Option(custom.get(k))
      .exists(_.longValue() > 0)),
      s"all rocksdb metrics zero: $custom")
    // execution memory stays bounded: state lives off-heap in RocksDB,
    // not in the operator's execution memory (512 MB is generous; an
    // on-heap 100k-key map would not show here anyway — the metric
    // guards the shuffle/sort path feeding the operator)
    assert(peakMem.get() < 512L * 1024 * 1024,
      s"peak per-task execution memory ${peakMem.get()}")
  }

  test("s33 timers: expiry at or below the final watermark fires — " +
    "the boundary is INCLUSIVE (expiry == watermark emits), and a " +
    "fired user's state is cleared (no second emission)") {
    import org.apache.spark.sql.streaming.Trigger
    val sq = spark; import sq.implicits._
    def t(sec: Long) = new Timestamp((1767225600L + sec) * 1000)
    val dir = Dml.work("s33spec", sf) + "_landing"
    // gap 100s. batch 0: u1 at 0 (timer 100), u2 at 100 (timer 200).
    // batch 1: driver u9 at 200 -> final watermark 200. u1's 100 < 200
    // fires; u2's 200 == 200 sits ON the boundary and ALSO fires —
    // TimerStateUtils treats expiry <= watermark as expired, the
    // inclusive rule this spec pins (the gated s33 keeps its margins
    // strictly away from the boundary regardless).
    val b0 = Seq((1L, t(0)), (2L, t(100))).toDF("user_id", "ts")
    val b1 = Seq((9L, t(200))).toDF("user_id", "ts")
    EventStreams.writeBatchLanding(spark, dir, Seq(b0, b1))
    val st = spark.readStream.schema(b0.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "0 seconds").as[TimedEvent]
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    val sink = "s33spec_out"
    try {
      val q = EventStreams.inactivityFinalize(st, gapSeconds = 100)
        .toDF().writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
    val got = spark.table(sink).as[UserFinal].collect().toSet
    spark.catalog.dropTempView(sink)
    assert(got == Set(
      UserFinal(1L, 1L, t(0)),
      UserFinal(2L, 1L, t(100))), got.toString)
  }

  test("s34 full outer: an orphan BUY null-pads its view side once the " +
    "view watermark passes buy_ts; a buy near end-of-stream stays " +
    "pending; matched and view-orphan classes behave as in left outer") {
    import org.apache.spark.sql.streaming.Trigger
    val sq = spark; import sq.implicits._
    def t(sec: Long) = new Timestamp((1767225600L + sec) * 1000)
    val vDir = Dml.work("s34spec_v", sf) + "_landing"
    val bDir = Dml.work("s34spec_b", sf) + "_landing"
    // views: u1 (will match), u2 (orphan view), late u9 at 03:00 that
    // drives the view-side watermark
    val views = Seq((1L, t(600)), (2L, t(600)), (9L, t(3 * 3600)))
      .toDF("user_id", "view_ts")
    // buys, batch 0: u1's match + u3's orphan buy at 00:20 (no view —
    // evicts once view-wm 03:00 > 00:20); batch 1: u8's buy at 03:30,
    // PAST the final view watermark -> must stay pending (absent)
    val buys0 = Seq((1L, t(2400), 7.5), (3L, t(1200), 3.0))
      .toDF("buy_user", "buy_ts", "buy_value")
    val buys1 = Seq((8L, t(3 * 3600 + 1800), 1.0))
      .toDF("buy_user", "buy_ts", "buy_value")
    EventStreams.writeBatchLanding(spark, vDir, Seq(views))
    EventStreams.writeBatchLanding(spark, bDir, Seq(buys0, buys1))
    val vs = spark.readStream.schema(views.schema)
      .option("maxFilesPerTrigger", "1").parquet(vDir)
    val bs = spark.readStream.schema(buys0.schema)
      .option("maxFilesPerTrigger", "1").parquet(bDir)
    val sink = "s34spec_out"
    val q = EventStreams.attributionJoinFull(vs, bs).writeStream
      .format("memory").queryName(sink).outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table(sink).collect().map(r => (r.getLong(0),
      Option(r.getTimestamp(1)).map(_.getTime / 1000 - 1767225600L),
      Option(r.getTimestamp(2)).map(_.getTime / 1000 - 1767225600L)))
      .toSet
    spark.catalog.dropTempView(sink)
    assert(got == Set(
      (1L, Some(600L), Some(2400L)),      // matched
      (2L, Some(600L), None),             // orphan view, buy side null
      (3L, None, Some(1200L))),           // orphan buy, view side null
      got.toString)
    // u9 (wm driver, window open past wm) and u8 (buy past the view
    // watermark) both stay PENDING — absence is the assertion
  }
}
