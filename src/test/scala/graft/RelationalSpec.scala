package graft

import org.apache.spark.sql.functions._

/** Plan-shape + semantics tests for the SURVEY §2 relational surface —
  * parity with (and beyond) the reference's 7 plan tests at
  * `/root/reference/tmp/crud.txt:859-1010`, but executed for real. */
class RelationalSpec extends SparkSpec {

  test("cross join cardinality = |L| * |R| (reference JoinType::Cross)") {
    val n = q("q08_join_cross").build(spark, sf).count()
    assert(n == 5L * 25L)
  }

  test("implicit comma cross-join + WHERE reduces to equi-join rows") {
    assert(q("q09_join_implicit_cross").build(spark, sf).count() == 25L)
  }

  test("semi + anti partition the left table (IN / NOT EXISTS forms)") {
    val semi = q("q26_semi_in").build(spark, sf).count()
    val anti = q("q27_anti_not_exists").build(spark, sf).count()
    val total = Tables.t(spark, sf, "customer").count()
    assert(semi + anti == total)
  }

  test("left join keeps all 25 nations; full outer >= left outer") {
    val left = q("q05_join_left").build(spark, sf)
    assert(left.select("n_name").distinct().count() == 25L)
    val full = q("q07_join_full").build(spark, sf).count()
    assert(full >= left.count())
  }

  test("limit/offset window: rows 6..15 of the total order") {
    val all = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(15).collect()
    val got = q("q14_sort_limit_offset").build(spark, sf).collect()
    assert(got.length == 10)
    assert(got.map(_.getLong(0)).toSeq == all.drop(5).map(_.getLong(0)).toSeq)
  }

  test("sort null placement: desc_nulls_first puts the null suppliers first") {
    val rows = q("q15_sort_nulls").build(spark, sf).collect()
    val firstNonNull = rows.indexWhere(!_.isNullAt(2))
    assert(rows.take(firstNonNull).forall(_.isNullAt(2)))
  }

  test("HAVING filters on the aggregate (Filter above Aggregate shape)") {
    val df = q("q13_having").build(spark, sf)
    assert(df.filter(col("n_orders") <= 20).count() == 0)
    // the plan really stacks Filter over Aggregate, as the reference plans
    // HAVING (tmp/select.rs:213-220)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("Filter") && analyzed.contains("Aggregate"))
  }

  test("CTE shadows catalog tables (tmp/select.rs:344-356 resolution order)") {
    Tables.ensureRegistered(spark, sf)
    val n = spark.sql(
      "WITH orders AS (SELECT 1 AS one) SELECT * FROM orders").count()
    assert(n == 1L)
  }

  test("global aggregate returns correct SQL semantics (SURVEY §2.4 quirk " +
    "deliberately not replicated)") {
    val row = q("q12_agg_global").build(spark, sf).collect().head
    assert(row.getLong(row.fieldIndex("cnt")) == 6000L)
  }

  test("distinct aggregate counts distinct, not all") {
    val row = q("q11_agg_groupby").build(spark, sf)
      .filter(col("c_nationkey") === 0).collect().head
    val nseg = row.getLong(row.fieldIndex("nseg"))
    assert(nseg >= 1 && nseg <= 5)
  }

  test("filter is pushed into the parquet scan and columns are pruned " +
    "(the reference's projected_schema never pruned, SURVEY §4)") {
    val plan = q("q02_filter_predicates").build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"), plan.take(500))
    // pruned read schema: no columns beyond the 5 selected + filters
    assert(!plan.contains("o_orderdate"))
  }

  test("fixed-size dims join as broadcasts, not shuffles (q30 plan)") {
    val plan = q("q30_local_supplier_volume").build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("implicit comma cross-join + WHERE is rewritten to a real equi-join " +
    "(no cartesian product survives in the physical plan)") {
    val plan = q("q09_join_implicit_cross").build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("USING join and ROLLUP run beyond reference parity (q33, q34)") {
    assert(q("q33_join_using").build(spark, sf).count() > 0)
    val roll = q("q34_rollup").build(spark, sf)
    // rollup: (nk, seg) groups + per-nk subtotals + grand total
    val grand = roll.filter(col("c_nationkey").isNull &&
      col("c_mktsegment").isNull).collect()
    assert(grand.length == 1 && grand.head.getLong(2) == 150L)
  }

  test("setops: union distinct <= union all; intersect <= either side") {
    val u = q("q20_setop_union").build(spark, sf).count()
    assert(u == 25L) // nation keys 0..24 on both sides
    val i = q("q21_setop_intersect").build(spark, sf).count()
    assert(i <= 25L && i > 0)
  }

  test("q56 correlated scalars decorrelate: the physical plan joins " +
    "per-key aggregates (no per-row subquery survives), the empty " +
    "group reads count 0 with a NULL max, and every nation row " +
    "survives the rewrite") {
    val out = q("q56_correlated_scalar").build(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("subquery"),
      s"subqueries must rewrite to joins:\n${plan.take(800)}")
    val rows = out.collect()
    assert(rows.length == 25, s"one row per nation: ${rows.length}")
    val empty = rows.filter(_.getLong(2) == 0L)
    assert(empty.nonEmpty, "fixture must exercise the empty group")
    assert(empty.forall(_.isNullAt(3)),
      "COUNT reads 0 on an empty group while MAX reads NULL")
  }
}
