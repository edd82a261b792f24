package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** The native as-of join operator (plans/AsOfJoin.scala): plan shape,
  * equivalence to the window-composed form, and the null/boundary
  * contract. The cross-ENGINE gate is s32 (shares s05's DuckDB oracle
  * verbatim); these specs pin the cross-FORM and physical properties. */
class AsOfJoinSpec extends SparkSpec {

  private def t(sec: Long) = new Timestamp(1767225600000L + sec * 1000)

  // 40 keys × 5 dim ticks × 3 probes, keys span many partitions; probe
  // ts values straddle dim ticks, including exact ties
  private def fixture = {
    val sq = spark; import sq.implicits._
    val dims = (for (k <- 1L to 40L; i <- 0L to 4L)
      yield (k, t(i * 100), k * 1000 + i)).toDF("k", "ts", "dim_v")
    val probes = (for (k <- 1L to 40L; j <- 0L to 2L)
      yield (k * 100 + j, k, t(j * 150 + (k % 3) * 50)))
      .toDF("pid", "k", "ts")
    (probes, dims)
  }

  private def native(probes: org.apache.spark.sql.DataFrame,
      dims: org.apache.spark.sql.DataFrame) =
    AsOfJoin.asofJoinNative(
      probes, dims.select(col("k"), col("ts").as("d_ts"),
        col("dim_v").as("d_v")),
      key = "k", ts = "ts", dimTs = "d_ts")

  test("plan: AsOfJoinExec with two exchanges + sorts planted by " +
    "EnsureRequirements, and no Window/Union anywhere (the composed " +
    "form's machinery is gone)") {
    val (probes, dims) = fixture
    val out = native(probes, dims)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800))
    assert(!plan.contains("Window") && !plan.contains("Union"),
      plan.take(800))
    // both children were re-clustered on the key and sorted (key, ts)
    assert("Exchange hashpartitioning".r
      .findAllMatchIn(plan).size == 2, plan.take(1200))
    assert("Sort \\[".r.findAllMatchIn(plan).size >= 2, plan.take(1200))
  }

  test("hot-key probe side: the salted form equals the unsalted join " +
    "row-for-row AND bounds the per-task shuffle read (AQE's " +
    "OptimizeSkewedJoin cannot split AsOfJoinExec's clustered " +
    "distribution — asofJoinSalted is the documented fallback)") {
    val sq = spark; import sq.implicits._
    // 8k probes, key 0 holds HALF the stream (the skew AQE won't fix
    // here); 20 keys × 5 dim ticks; probe timestamps vary so the
    // ts-derived salt has something to spread on
    val probes = spark.range(8000).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 20).as("k"),
      expr("timestamp_seconds(1767225600 + (id % 997) * 7)").as("ts"),
      col("id").as("p_v"))
    val dims = spark.range(100).select(
      (col("id") % 20).as("k"),
      expr("timestamp_seconds(1767225600 + (id DIV 20) * 1200)")
        .as("d_ts"),
      (col("id") * 10).as("d_v"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity)
        .view.mapValues(_.size).toMap
    val plain = AsOfJoin.asofJoinNative(
      probes, dims, key = "k", ts = "ts", dimTs = "d_ts")
    val salted = AsOfJoin.asofJoinSalted(
      probes, dims, key = "k", ts = "ts", dimTs = "d_ts", salts = 8)
    assert(canon(plain) == canon(salted))
    assert(salted.count() == 8000L)
    // runtime evidence: max records any single task pulls off the
    // shuffle. Unsalted, key 0's 4k probes land in ONE task; salted,
    // they spread over 8 composite keys (floor ~4k/8 + dim×salts
    // replication noise).
    def maxTaskShuffleRead(action: => Unit): Long = {
      val maxR = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) maxR.getAndUpdate(v =>
            math.max(v, m.shuffleReadMetrics.recordsRead))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        action
        var last = -1L; var stable = 0; var tries = 0
        while (stable < 3 && tries < 50) {
          Thread.sleep(100)
          val now = maxR.get()
          if (now == last) stable += 1 else { stable = 0; last = now }
          tries += 1
        }
        maxR.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // at fixture scale AQE's partition coalescing would merge the tiny
    // shuffle into ONE reducer and mask the key spread — scope it off
    // and widen the reducer count so per-task reads reflect keys
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val plainMax = maxTaskShuffleRead { plain.count() }
      val saltedMax = maxTaskShuffleRead { salted.count() }
      assert(plainMax >= 4000L,
        s"unsalted hot key must concentrate in one task, got $plainMax")
      assert(saltedMax <= plainMax / 2,
        s"salting must spread the hot key: salted $saltedMax " +
          s"vs plain $plainMax")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
  }

  test("salted null-key contract: null keys never match even though the " +
    "composite key is a string") {
    val sq = spark; import sq.implicits._
    val probes = Seq(
      (Option(1L), t(100), "p1"),
      (Option.empty[Long], t(100), "p_null"))
      .toDF("k", "ts", "p_v")
    val dims = Seq(
      (Option(1L), t(50), "d1"),
      (Option.empty[Long], t(50), "d_null"))
      .toDF("k", "d_ts", "d_v")
    val out = AsOfJoin.asofJoinSalted(
      probes, dims, key = "k", ts = "ts", dimTs = "d_ts", salts = 4)
      .collect()
    assert(out.length == 1 && out.head.getAs[String]("p_v") == "p1" &&
      out.head.getAs[String]("d_v") == "d1",
      out.mkString("; "))
  }

  test("registration is idempotent: repeated native builds keep exactly " +
    "one strategy and one optimizer rule (the r12 guard checked only " +
    "the experimental lists; it now also sees GraftExtensions-injected " +
    "copies via planner.strategies / extendedOperatorOptimizationRules)") {
    val (probes, dims) = fixture
    native(probes, dims).count()
    native(probes, dims).count()
    assert(spark.experimental.extraStrategies
      .count(_.isInstanceOf[AsOfJoinStrategy]) == 1)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[AsOfJoinFilterPushdown]) == 1)
    assert(spark.sessionState.planner.strategies
      .count(_.isInstanceOf[AsOfJoinStrategy]) == 1)
  }

  test("native equals the composed window form row-for-row (ties at " +
    "equal ts match; probes before any dim drop out)") {
    val (probes, dims) = fixture
    val nat = native(probes, dims)
      .select("pid", "k", "ts", "d_ts", "d_v")
      .collect().map(_.toSeq).toSet
    val composed = EventQueries.asofJoin(
      probe = probes, dim = dims, key = "k", ts = "ts", tsOut = "d_ts",
      dimCols = Seq("dim_v" -> "d_v"))
      .select("pid", "k", "ts", "d_ts", "d_v")
      .collect().map(_.toSeq).toSet
    assert(nat.nonEmpty && nat == composed,
      s"native ${nat.size} rows vs composed ${composed.size}")
    // spot semantics: probe at an exact dim tick takes THAT dim (<=)
    val sq = spark; import sq.implicits._
    val one = native(
      Seq((1L, 7L, t(100))).toDF("pid", "k", "ts"),
      Seq((7L, t(100), 42L), (7L, t(99), 41L))
        .toDF("k", "ts", "dim_v")).collect()
    assert(one.length == 1 && one.head.getLong(4) == 42L)
  }

  test("null keys/timestamps never match and null probes drop (inner " +
    "contract); a dim-side null mid-stream does not derail the merge") {
    val sq = spark; import sq.implicits._
    val probes = Seq(
      (1L, Option(5L), Option(t(100))),
      (2L, Option.empty[Long], Option(t(100))),
      (3L, Option(5L), Option.empty[Timestamp]))
      .toDF("pid", "k", "ts")
    val dims = Seq(
      (Option.empty[Long], Option(t(50)), 1L),
      (Option(5L), Option.empty[Timestamp], 2L),
      (Option(5L), Option(t(60)), 3L))
      .toDF("k", "ts", "dim_v")
    val out = native(probes, dims).collect()
    assert(out.length == 1, out.mkString(";"))
    assert(out.head.getLong(0) == 1L && out.head.getLong(4) == 3L)
  }

  test("left-outer native: unmatched probes survive with null-padded " +
    "dim payload, equal to the composed leftOuter form") {
    val sq = spark; import sq.implicits._
    val (probes0, dims) = fixture
    // one probe BEFORE any dim tick: the unmatched row outer must keep
    val probes = probes0.unionByName(
      Seq((9999L, 7L, t(-100))).toDF("pid", "k", "ts"))
    val nat = AsOfJoin.asofJoinNative(
      probes, dims.select(col("k"), col("ts").as("d_ts"),
        col("dim_v").as("d_v")),
      key = "k", ts = "ts", dimTs = "d_ts", leftOuter = true)
      .select("pid", "k", "ts", "d_ts", "d_v")
      .collect().map(_.toSeq).toSet
    val composed = EventQueries.asofJoin(
      probe = probes, dim = dims, key = "k", ts = "ts", tsOut = "d_ts",
      dimCols = Seq("dim_v" -> "d_v"), leftOuter = true)
      .select("pid", "k", "ts", "d_ts", "d_v")
      .collect().map(_.toSeq).toSet
    assert(nat == composed,
      s"native ${nat.size} rows vs composed ${composed.size}")
    // every probe survives; the unmatched ones carry nulls
    assert(nat.size == probes.count())
    assert(nat.exists(r => r(3) == null && r(4) == null))
  }

  test("forward native: earliest dim at-or-after per key equals the " +
    "composed forward form; equal-ts still matches") {
    val (probes, dims) = fixture
    val nat = AsOfJoin.asofJoinNative(
      probes, dims.select(col("k"), col("ts").as("d_ts"),
        col("dim_v").as("d_v")),
      key = "k", ts = "ts", dimTs = "d_ts", forward = true)
      .select("pid", "k", "ts", "d_ts", "d_v")
      .collect().map(_.toSeq).toSet
    val composed = EventQueries.asofJoin(
      probe = probes, dim = dims, key = "k", ts = "ts", tsOut = "d_ts",
      dimCols = Seq("dim_v" -> "d_v"), forward = true)
      .select("pid", "k", "ts", "d_ts", "d_v")
      .collect().map(_.toSeq).toSet
    assert(nat.nonEmpty && nat == composed,
      s"native ${nat.size} vs composed ${composed.size}")
    // probe exactly on a dim tick matches THAT tick, not the next
    val sq = spark; import sq.implicits._
    val one = AsOfJoin.asofJoinNative(
      Seq((1L, 7L, t(100))).toDF("pid", "k", "ts"),
      Seq((7L, t(100), 42L), (7L, t(101), 43L))
        .toDF("k", "ts", "dim_v")
        .select(col("k"), col("ts").as("d_ts"), col("dim_v").as("d_v")),
      key = "k", ts = "ts", dimTs = "d_ts", forward = true).collect()
    assert(one.length == 1 && one.head.getLong(4) == 42L,
      one.mkString(";"))
  }

  test("filter pushdown rule: a probe-side predicate above the as-of " +
    "join reaches the parquet scan (PushedFilters), a carried-dim " +
    "predicate stays above, and results are unchanged") {
    val ev = Tables.t(spark, sf, "events")
    def build() = AsOfJoin.asofJoinNative(
      probe = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts"),
      dim = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("d_v"))
        .select(col("user_id"), col("ts").as("d_ts"), col("d_v")),
      key = "user_id", ts = "ts", dimTs = "d_ts")
    val filtered = build().filter(col("event_id") < 500)
    val plan = filtered.queryExecution.executedPlan.toString
    // the predicate crossed the custom node all the way into the scan
    assert(plan.contains("LessThan(event_id,500)"), plan.take(1500))
    // and the optimized plan has no Filter ABOVE the join anymore
    val opt = filtered.queryExecution.optimizedPlan
    assert(!opt.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Filter], opt.nodeName)
    // a predicate on the CARRIED dim column must not push: the top
    // optimized node stays a Filter over the join
    val dimFiltered = build().filter(col("d_v") > 1.0)
    assert(dimFiltered.queryExecution.optimizedPlan.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Filter])
    // pushdown changed the plan, not the answer
    val viaPush = filtered.collect().map(_.toSeq).toSet
    val viaPre = build().collect().map(_.toSeq)
      .filter(r => r(0).asInstanceOf[Long] < 500).toSet
    assert(viaPush == viaPre)
  }
}
