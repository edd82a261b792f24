package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost-based-optimizer evidence: ANALYZE'd catalog tables + a join whose
  * ORDER the statistics flip.
  *
  * Every other optimizer surface this engine leans on already has gated
  * evidence (pushdown/pruning in PLANS.md, DPP in io17, runtime bloom in
  * k04, AQE skew in k03); CBO join reorder was the one Catalyst facility
  * with none (r13 verdict item 6). The demonstration needs three pieces,
  * all here:
  *
  *  1. REAL CATALOG TABLES — `ANALYZE TABLE` rejects temp views, so the
  *     three join inputs register as EXTERNAL parquet tables
  *     (`cbo_lineitem` / `cbo_orders` / `cbo_customer`) pointing at the
  *     fixture files; CREATE + ANALYZE touch metadata only (no copy).
  *  2. COLUMN STATISTICS — `COMPUTE STATISTICS FOR ALL COLUMNS` gives
  *     row counts plus min/max/NDV, which is what lets
  *     FilterEstimation price the selective `c_acctbal` predicate and
  *     CostBasedJoinReorder's DP search price every join order.
  *  3. A QUERY WRITTEN IN THE WRONG ORDER — syntactically
  *     (lineitem ⋈ orders) ⋈ customer: the left-deep syntactic plan
  *     builds the LARGEST possible intermediate first (every lineitem
  *     row survives l⋈o). With stats on, the optimizer reorders to
  *     (orders ⋈ customer′) ⋈ lineitem — the filtered-customer join
  *     first, shrinking the intermediate by the filter's selectivity.
  *     At 100 TB that reorder is the difference between shuffling the
  *     full fact through two joins or one.
  *
  * The conf scope must outlive ANALYSIS but cover OPTIMIZATION:
  * `queryExecution.executedPlan` is forced INSIDE [[withCboConfs]] —
  * QueryExecution memoizes its phases, so the CBO-on plan is pinned
  * before the scope restores the session confs, and the later action
  * (Verify's collect, the spec's count) executes exactly that plan.
  * CboSpec asserts the flip itself: innermost join = orders⋈customer
  * with reorder on, lineitem-first with it off, identical rows both
  * ways. PLANS.md carries both optimized plans via explainOverride.
  */
object Cbo {

  private val tables = Seq("lineitem", "orders", "customer")

  // (session, sfDir) the cbo_* tables currently point at — octave runs
  // re-call with a different dir and MUST re-create + re-analyze, or the
  // external tables silently keep serving the previous scale's files
  // (the Tables.ensureRegistered discipline).
  private val statsFor = scala.collection.mutable.Map[Int, String]()

  /** Register `cbo_<t>` external parquet tables over `sfDir` and compute
    * row + column statistics — once per (session, dir). */
  def ensureStats(spark: SparkSession, sfDir: String): Unit =
    synchronized {
      val key = System.identityHashCode(spark)
      if (!statsFor.get(key).contains(sfDir)) {
        tables.foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS cbo_$t")
          spark.sql(s"CREATE TABLE cbo_$t USING parquet " +
            s"LOCATION '${Tables.path(sfDir, t)}'")
          spark.sql(
            s"ANALYZE TABLE cbo_$t COMPUTE STATISTICS FOR ALL COLUMNS")
        }
        statsFor(key) = sfDir
      }
    }

  /** Run `body` with CBO + stats-driven join reorder on, restoring the
    * session values after (the scoped-conf discipline of
    * [[Skew.withSkewConfs]]). `reorder = false` keeps CBO's cardinality
    * estimation but pins the syntactic join order — the control arm the
    * spec diffs against. */
  private[graft] def withCboConfs[T](
      spark: SparkSession, reorder: Boolean = true)(body: => T): T = {
    val keys = Seq(
      "spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), reorder.toString)
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** The q60 join, written large-first, planned under stats. Exposed
    * with the `reorder` toggle for the spec's two-arm comparison. */
  private[graft] def reorderJoin(
      spark: SparkSession, sfDir: String,
      reorder: Boolean = true): DataFrame = {
    ensureStats(spark, sfDir)
    withCboConfs(spark, reorder) {
      val df = spark.sql(
        """SELECT c_mktsegment, count(*) AS n_items,
          |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          |  AS sum_qty
          |FROM cbo_lineitem
          |JOIN cbo_orders ON l_orderkey = o_orderkey
          |JOIN cbo_customer ON o_custkey = c_custkey
          |WHERE c_acctbal > 9000.0
          |GROUP BY c_mktsegment""".stripMargin)
      // force OPTIMIZATION inside the conf scope — that is the phase
      // CostBasedJoinReorder runs in, and the only one consumed below
      // (forcing executedPlan too would physical-plan a frame nobody
      // executes, in every timed bench iteration).
      df.queryExecution.optimizedPlan
      // Downstream WRITES (Bench's noop sink, Verify's parquet
      // dump) wrap the frame in a NEW QueryExecution outside this conf
      // scope, where CostBasedJoinReorder is off — they would silently
      // re-plan the SYNTACTIC order. So hand back a frame built FROM
      // the optimized plan: re-optimization without CBO preserves an
      // existing join order (every join keeps its condition), it just
      // cannot re-derive the reorder. The benched plan is the CBO plan.
      org.apache.spark.sql.GraftBridge
        .ofRows(spark, df.queryExecution.optimizedPlan)
    }
  }

  /** Leaf catalog-table names under the INNERMOST join of the optimized
    * plan — the spec's order probe ("which pair did the optimizer join
    * first?"). */
  private[graft] def innermostJoinLeaves(df: DataFrame): Set[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    def leaves(p: LogicalPlan): Seq[String] =
      p.collectLeaves().flatMap { l =>
        l.toString.split("\n").headOption.toSeq
          .flatMap("cbo_[a-z]+".r.findAllIn(_))
      }
    df.queryExecution.optimizedPlan.collect {
      case j: Join if !j.children.exists(
        _.exists(_.isInstanceOf[Join])) => leaves(j).toSet
    }.headOption.getOrElse(Set.empty)
  }
}

/** q60 under the driver's hash gate: the reorder toggle changes the PLAN,
  * never the rows — exactly what the oracle comparison holds. */
object CboQueries {
  val queries: Seq[Q] = Seq(
    Q("q60_cbo_reorder",
      (s, d) => Cbo.reorderJoin(s, d),
      Some("""SELECT c_mktsegment, count(*) AS n_items,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_acctbal > 9000.0 GROUP BY c_mktsegment"""
        .stripMargin.replace('\n', ' ')),
      bench = true,
      explainOverride = Some((s, d) => {
        val off = Cbo.reorderJoin(s, d, reorder = false)
        val on = Cbo.reorderJoin(s, d, reorder = true)
        "== Optimized plan, stats present, joinReorder OFF " +
          "(syntactic order: lineitem first) ==\n" +
          off.queryExecution.optimizedPlan.toString +
          "\n== Optimized plan, stats present, joinReorder ON " +
          "(stats-driven order: filtered customer x orders first) ==\n" +
          on.queryExecution.optimizedPlan.toString +
          "\n== Executed (reorder ON) ==\n" +
          on.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
      }))
  )
}
