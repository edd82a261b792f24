package graft

/** CBO evidence: statistics flip the join ORDER, never the rows.
  *
  * The q60 query is written syntactically large-first —
  * (lineitem ⋈ orders) ⋈ filtered-customer — so a planner that keeps
  * syntactic order builds the biggest possible intermediate first.
  * With ANALYZE'd row + column stats and joinReorder on, Catalyst's
  * CostBasedJoinReorder should join the filtered customer side first.
  */
class CboSpec extends SparkSpec {

  test("q60: stats-driven join reorder flips the innermost join " +
    "(lineitem-first syntactic -> filtered-customer-first)") {
    val off = Cbo.reorderJoin(spark, sf, reorder = false)
    val on = Cbo.reorderJoin(spark, sf, reorder = true)

    val offInner = Cbo.innermostJoinLeaves(off)
    val onInner = Cbo.innermostJoinLeaves(on)
    // control arm keeps the syntactic order: lineitem joined first
    assert(offInner.contains("cbo_lineitem"),
      s"reorder-off innermost join should be syntactic (saw $offInner)")
    // stats arm starts from the small side: orders x filtered customer
    assert(onInner == Set("cbo_orders", "cbo_customer"),
      s"reorder-on innermost join should be orders x customer (saw $onInner)")

    // the reorder is semantically invisible — identical result rows
    val a = off.orderBy("c_mktsegment").collect().map(_.toSeq).toSeq
    val b = on.orderBy("c_mktsegment").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("q60: cbo confs are scoped - session values restored after") {
    val before = Seq(
      "spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled").map(spark.conf.getOption)
    Cbo.reorderJoin(spark, sf)
    val after = Seq(
      "spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled").map(spark.conf.getOption)
    assert(before == after)
  }

  test("q60: analyzed catalog tables carry row and column statistics") {
    Cbo.ensureStats(spark, sf)
    val stats = spark.sql("DESCRIBE EXTENDED cbo_customer")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats.get("Statistics").exists(_.contains("rows")),
      s"cbo_customer should carry ANALYZE row counts (saw ${stats.get("Statistics")})")
    val colStats = spark.sql("DESCRIBE EXTENDED cbo_customer c_acctbal")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(colStats.get("min").exists(_ != "NULL"),
      s"c_acctbal should carry min/max column stats (saw $colStats)")
  }
}
