package graft

import org.apache.spark.sql.functions._

/** Bucketed-layout co-located join: both fact tables bucketed on the join
  * key means the join plan has NO shuffle — the scale property the layout
  * exists to buy. */
class BucketingSpec extends SparkSpec {

  test("orders ⋈ lineitem over matching buckets runs with zero Exchange") {
    Layouts.writeBucketed(
      Tables.t(spark, sf, "orders"), "b_orders", "o_orderkey", 8)
    Layouts.writeBucketed(
      Tables.t(spark, sf, "lineitem"), "b_lineitem", "l_orderkey", 8)
    try {
      // force a real (non-broadcast) join so the shuffle question is live
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "o_totalprice", "l_quantity")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      // and it still computes the right thing
      assert(joined.count() ==
        Tables.t(spark, sf, "lineitem").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    Layouts.writeBucketed(
      Tables.t(spark, sf, "orders"), "b_orders2", "o_orderkey", 8)
    Layouts.writeBucketed(
      Tables.t(spark, sf, "lineitem"), "b_lineitem2", "l_orderkey", 4)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders2")
        .join(spark.table("b_lineitem2"),
          col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() == Tables.t(spark, sf, "lineitem").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders2")
      spark.sql("DROP TABLE IF EXISTS b_lineitem2")
    }
  }
}
