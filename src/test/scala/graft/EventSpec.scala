package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Edge-case tests for the batch event operators — chiefly
  * [[EventQueries.asofJoin]], whose equal-ts / no-match / latest-wins
  * semantics must mirror DuckDB's ASOF JOIN (`probe.ts >= dim.ts`,
  * inner). */
class EventSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest prior dim wins, equal ts matches, " +
    "no-prior probes drop (inner ASOF semantics)") {
    val sq = spark; import sq.implicits._
    val dim = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 12.0),
      (2L, ts("2024-01-01 11:00:00"), 21.0))
      .toDF("user_id", "ts", "dim_value")
    val probe = Seq(
      (100L, 1L, ts("2024-01-01 11:00:00")), // between dims -> 10.0
      (101L, 1L, ts("2024-01-01 12:00:00")), // equal ts -> matches 12.0
      (102L, 1L, ts("2024-01-01 13:00:00")), // after both -> 12.0
      (103L, 2L, ts("2024-01-01 10:59:59")), // before user 2's dim -> drops
      (104L, 3L, ts("2024-01-01 23:00:00"))) // no dim for user -> drops
      .toDF("event_id", "user_id", "ts")
    val out = EventQueries.asofJoin(
      probe, dim, "user_id", "ts", "m_ts", Seq("dim_value" -> "m_val"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (100L, ts("2024-01-01 10:00:00"), 10.0),
      (101L, ts("2024-01-01 12:00:00"), 12.0),
      (102L, ts("2024-01-01 12:00:00"), 12.0)))
  }

  test("asofJoin leftOuter keeps unmatched probes with typed-NULL dim " +
    "payload (DuckDB ASOF LEFT JOIN semantics); matched rows equal inner") {
    val sq = spark; import sq.implicits._
    val dim = Seq((1L, ts("2024-01-01 10:00:00"), 10.0))
      .toDF("user_id", "ts", "dim_value")
    val probe = Seq(
      (100L, 1L, ts("2024-01-01 11:00:00")), // matches
      (103L, 1L, ts("2024-01-01 09:00:00")), // before the dim -> null
      (104L, 3L, ts("2024-01-01 23:00:00"))) // keyless -> null
      .toDF("event_id", "user_id", "ts")
    val out = EventQueries.asofJoin(
      probe, dim, "user_id", "ts", "m_ts", Seq("dim_value" -> "m_val"),
      leftOuter = true)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(out.toSeq == Seq(
      (100L, Some(ts("2024-01-01 10:00:00")), Some(10.0)),
      (103L, None, None),
      (104L, None, None)))
  }

  test("asofJoin forward direction matches the EARLIEST dim at or after " +
    "the probe; probes after the last dim drop") {
    val sq = spark; import sq.implicits._
    val dim = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 12.0),
      (2L, ts("2024-01-01 11:00:00"), 21.0))
      .toDF("user_id", "ts", "dim_value")
    val probe = Seq(
      (100L, 1L, ts("2024-01-01 11:00:00")), // next dim -> 12.0
      (101L, 1L, ts("2024-01-01 12:00:00")), // equal ts -> 12.0
      (102L, 1L, ts("2024-01-01 13:00:00")), // after last -> drops
      (103L, 2L, ts("2024-01-01 10:59:59"))) // next -> 21.0
      .toDF("event_id", "user_id", "ts")
    val out = EventQueries.asofJoin(
      probe, dim, "user_id", "ts", "m_ts", Seq("dim_value" -> "m_val"),
      forward = true)
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (100L, ts("2024-01-01 12:00:00"), 12.0),
      (101L, ts("2024-01-01 12:00:00"), 12.0),
      (103L, ts("2024-01-01 11:00:00"), 21.0)))
  }

  test("interval-join bucketization is exact at the window boundary and " +
    "across cell borders (every qualifying pair in exactly one cell)") {
    val sq = spark; import sq.implicits._
    val w = 1800L
    // probe at 10:00:00; clicks at exactly -w, -w-1, +w, +w+1, and one in
    // a neighboring bucket cell but inside the window
    val base = ts("2024-01-01 10:00:00").getTime / 1000
    def at(off: Long) = new Timestamp((base + off) * 1000)
    val ev = (Seq(
      (1L, 1L, at(0), "purchase"),
      (10L, 1L, at(-w), "click"), // |d| == w  -> counts
      (11L, 1L, at(-w - 1), "click"), // just outside -> no
      (12L, 1L, at(w), "click"), // |d| == w  -> counts
      (13L, 1L, at(w + 1), "click"), // just outside -> no
      (14L, 1L, at(1), "click"), // same cell -> counts
      (15L, 2L, at(0), "click")) // other user -> no
      ).toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    // run the s06 pipeline shape directly on the fixture
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").cast("long").as("c_sec"))
      .withColumn("cell", floor(col("c_sec") / w))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("p_sec", col("ts").cast("long"))
      .withColumn("cell", explode(array(floor(col("p_sec") / w) - 1,
        floor(col("p_sec") / w), floor(col("p_sec") / w) + 1)))
    val got = probes.join(clicks,
        probes("user_id") === clicks("c_user") &&
          probes("cell") === clicks("cell") &&
          abs(col("c_sec") - col("p_sec")) <= w, "left")
      .groupBy("event_id").agg(count(col("c_sec")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L),
      s"expected clicks 10, 12, 14 to count exactly once each; got $got")
  }

  test("asofJoin plan: one Exchange on the key — no range-join explosion, " +
    "no cartesian") {
    val sq = spark; import sq.implicits._
    val dim = Seq((1L, ts("2024-01-01 10:00:00"), 1.0))
      .toDF("user_id", "ts", "v")
    val probe = Seq((9L, 1L, ts("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts")
    val plan = EventQueries.asofJoin(
      probe, dim, "user_id", "ts", "m_ts", Seq("v" -> "m_v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "asof must stay a union+window, never a join explosion")
    val exchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected union-side exchanges only, got:\n$plan")
  }

  test("funnel: strict-after stage ordering, drop-offs keep nulls, " +
    "pre-stage events never count, non-entrants are absent") {
    val sq = spark; import sq.implicits._
    val events = Seq(
      // user 1: full funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: click BEFORE the first view -> click must not count;
      // no click after the view -> funnel stops at t1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      // user 3: never views -> not in the funnel at all
      (3L, ts("2024-01-01 08:00:00"), "click"),
      (3L, ts("2024-01-01 08:05:00"), "purchase"),
      // user 4: view then purchase with no click between -> t3 null
      // (the purchase is not preceded by a qualifying click)
      (4L, ts("2024-01-01 11:00:00"), "view"),
      (4L, ts("2024-01-01 11:30:00"), "purchase"),
      // user 5: two views, click between them -> t1 is the FIRST view,
      // the click after it counts even though a later view follows
      (5L, ts("2024-01-01 12:00:00"), "view"),
      (5L, ts("2024-01-01 12:10:00"), "click"),
      (5L, ts("2024-01-01 12:20:00"), "view"),
      (5L, ts("2024-01-01 12:30:00"), "purchase"),
      // user 6: click at EXACTLY t1 -> strictly-after excludes it, so the
      // later purchase has no qualifying click either (pins ts > prev
      // against a silent regression to >=)
      (6L, ts("2024-01-01 13:00:00"), "view"),
      (6L, ts("2024-01-01 13:00:00"), "click"),
      (6L, ts("2024-01-01 13:10:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventQueries.funnel(events, Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)))).toMap
    ManagedCache.releaseAll()
    assert(got.keySet == Set(1L, 2L, 4L, 5L, 6L), "only viewers enter")
    assert(got(1L) == ((Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 10:05:00")), Some(ts("2024-01-01 10:10:00")))))
    assert(got(2L) == ((Some(ts("2024-01-01 09:30:00")), None, None)))
    assert(got(4L) == ((Some(ts("2024-01-01 11:00:00")), None, None)))
    assert(got(5L) == ((Some(ts("2024-01-01 12:00:00")),
      Some(ts("2024-01-01 12:10:00")), Some(ts("2024-01-01 12:30:00")))))
    assert(got(6L) == ((Some(ts("2024-01-01 13:00:00")), None, None)))
  }

  test("funnel tolerates an input column named t1 (stage columns compute " +
    "under collision-safe internal names)") {
    val sq = spark; import sq.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", "x"),
      (1L, ts("2024-01-01 10:05:00"), "click", "y"))
      .toDF("user_id", "ts", "event_type", "t1")
    val out = EventQueries.funnel(events, Seq("view", "click")).collect()
    ManagedCache.releaseAll()
    assert(out.length == 1 &&
      out.head.getTimestamp(1) == ts("2024-01-01 10:00:00") &&
      out.head.getTimestamp(2) == ts("2024-01-01 10:05:00"))
  }

  test("events ts loader is schema-adaptive (the round-9 testdata " +
    "regeneration class): nanos-long, TIMESTAMP_NTZ and native " +
    "timestamp all normalize to the same instant; other types refuse") {
    val sq = spark; import sq.implicits._
    import org.apache.spark.sql.types._
    val instant = ts("2026-01-02 03:04:05.123456")
    val micros = instant.getTime * 1000L + 456L // epoch µs (UTC session)
    // branch 1: raw nanos as long (legacy TIMESTAMP(NANOS) files)
    val fromNanos = Tables.eventsTsFromNanos(
      Seq(micros * 1000L).toDF("ts"))
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.collect().head.getTimestamp(0) == instant)
    // branch 2: TIMESTAMP_NTZ (regenerated timestamp[us] files) — the
    // UTC session makes the cast instant-preserving
    val ntz = Seq(micros * 1000L).toDF("n")
      .select(timestamp_micros(expr("n div 1000")).cast("timestamp_ntz")
        .as("ts"))
    assert(ntz.schema("ts").dataType.isInstanceOf[TimestampNTZType])
    val fromNtz = Tables.eventsTsFromNanos(ntz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.collect().head.getTimestamp(0) == instant)
    // branch 3: native timestamp passes through untouched
    val native = Seq(instant).toDF("ts")
    assert(Tables.eventsTsFromNanos(native).collect()
      .head.getTimestamp(0) == instant)
    // anything else is a loud refusal, not a silent mis-parse
    val e = intercept[IllegalStateException] {
      Tables.eventsTsFromNanos(Seq("2026-01-01").toDF("ts"))
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("embeddings loader is schema-adaptive (same regeneration class): " +
    "array<double>/bigint-label normalize to the canonical " +
    "array<float>/int; float32 passes through; non-numeric refuses") {
    val sq = spark; import sq.implicits._
    import org.apache.spark.sql.types._
    // canonical float32 input: untouched (same plan, no cast node)
    val f = Seq((1L, Seq(0.5f, -1.25f), 3))
      .toDF("vec_id", "embedding", "label")
    assert(Tables.embeddingsCanonical(f) eq f)
    // regenerated-as-double input: cast back to the canonical schema the
    // native vector expressions (strict array<float>) were built against
    val d = Seq((1L, Seq(0.5d, -1.25d), 3L))
      .toDF("vec_id", "embedding", "label")
    val norm = Tables.embeddingsCanonical(d)
    assert(norm.schema("embedding").dataType == ArrayType(FloatType, true) ||
      norm.schema("embedding").dataType == ArrayType(FloatType, false))
    assert(norm.schema("label").dataType == IntegerType)
    assert(norm.select("embedding").as[Seq[Float]].head() ==
      Seq(0.5f, -1.25f))
    // and the normalized frame feeds the native cosine without error
    assert(!norm.select(
      VectorExpressions.cosineSim(col("embedding"), col("embedding"))
        .as("s")).head().isNullAt(0))
    // non-numeric array element: loud refusal
    val e2 = intercept[IllegalStateException] {
      Tables.embeddingsCanonical(
        Seq((1L, Seq("x"), 3)).toDF("vec_id", "embedding", "label"))
    }
    assert(e2.getMessage.contains("unsupported type"))
  }

  test("s28 forward fill carries the last observation per user, " +
    "leaves leading gaps NULL, and copies values exactly") {
    val sq = spark; import sq.implicits._
    def ts(m: Int) = new Timestamp(m * 60000L)
    val events = Seq(
      // user 1 opens with a gap: nothing to carry -> stays NULL
      (1L, 1L, ts(0), None),
      (2L, 1L, ts(1), Some(20.25)),
      (3L, 1L, ts(2), None),            // carries 20.25
      (4L, 1L, ts(3), Some(30.5)),
      (5L, 1L, ts(4), None),            // carries 30.5, not 20.25
      // user 2 is an independent series: no cross-user leakage
      (6L, 2L, ts(0), Some(40.0)),
      (7L, 2L, ts(1), None))            // carries 40.0
      .toDF("event_id", "user_id", "ts", "v")
    val got = EventQueries.forwardFill(events).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> None, 2L -> Some(20.25), 3L -> Some(20.25),
      4L -> Some(30.5), 5L -> Some(30.5),
      6L -> Some(40.0), 7L -> Some(40.0)), got.toString)
  }
}
