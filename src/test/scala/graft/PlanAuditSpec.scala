package graft

import org.apache.spark.sql.execution.FormattedMode

/** Automated plan-quality audit over the ENTIRE bench set — the scale
  * invariants a human plan review checks, promoted to a regression
  * gate so a future entry (or a builder refactor) cannot silently
  * reintroduce a scale killer. Plans are built against sf0.001 (plan
  * SHAPE does not depend on scale factor; AQE may re-pick join
  * strategies at runtime, which only improves on what is asserted
  * here).
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val benchPlans: Seq[(String, String)] =
    QueryCatalog.all.filter(_.bench).map { qq =>
      qq.name -> qq.build(spark, sf).queryExecution
        .explainString(FormattedMode)
    }

  test("no bench entry plans a CartesianProduct — every cross-shaped " +
    "join must be a broadcast of a provably tiny side " +
    "(BroadcastNestedLoopJoin), never the quadratic shuffle form") {
    val offenders = benchPlans.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty,
      s"CartesianProduct found in: ${offenders.mkString(", ")}")
  }

  // NOTE deliberately absent: a whole-stage-codegen presence check.
  // Under AQE the pre-execution formatted plan (isFinalPlan=false) has
  // not run CollapseCodegenStages yet, so codegen ids are only visible
  // after execution — PLANS.md (generated post-run by graft.Profile)
  // is where codegen spans are reviewed.

  test("q04 column pruning reaches both scans: orders reads only its " +
    "3 needed columns (not o_orderdate/o_orderpriority), customer " +
    "only 2, and the dim side broadcasts") {
    val plan = benchPlans.toMap.apply("q04_join_inner")
    assert(plan.contains("BroadcastHashJoin"), "dim join must broadcast")
    assert(!plan.contains("o_orderdate") && !plan.contains("o_orderpriority"),
      "orders scan must prune unused columns")
    assert(!plan.contains("c_acctbal") && !plan.contains("c_mktsegment"),
      "customer scan must prune unused columns")
  }

  test("q29's date-range predicates are pushed into the parquet scans " +
    "(PushedFilters non-empty), not applied post-scan only") {
    val plan = benchPlans.toMap.apply("q29_shipping_priority")
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters: ["))
      .filterNot(_.contains("PushedFilters: []")).toSeq
    assert(pushed.nonEmpty, s"expected non-empty PushedFilters:\n$plan")
  }
}
