package graft

import org.apache.spark.sql.functions._

/** Contracts of the deterministic sampling/split operators. */
class SamplingSpec extends SparkSpec {

  test("deterministic split hits ~80/10/10 and re-evaluates identically") {
    val docs = Tables.t(spark, sf, "documents")
    def fracs() = docs
      .withColumn("split", Sampling.deterministicSplit(col("text")))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = fracs()
    val n = a.values.sum.toDouble
    assert(math.abs(a("train") / n - 0.8) < 0.05, a)
    assert(math.abs(a("val") / n - 0.1) < 0.05, a)
    assert(math.abs(a("test") / n - 0.1) < 0.05, a)
    assert(fracs() == a, "split must be reproducible across evaluations")
  }

  test("byte-identical duplicate documents land in the SAME split " +
    "(content keying prevents train/test leakage)") {
    val docs = Tables.t(spark, sf, "documents")
      .withColumn("split", Sampling.deterministicSplit(col("text")))
    val crossSplit = docs.groupBy("text")
      .agg(countDistinct(col("split")).as("nsplits"))
      .filter(col("nsplits") > 1)
    assert(crossSplit.count() == 0)
  }

  test("deterministicSample keeps approximately the hex-threshold " +
    "fraction") {
    val docs = Tables.t(spark, sf, "documents")
    val total = docs.count().toDouble
    val kept = docs
      .filter(Sampling.deterministicSample(col("text"), "1999")) // ~10%
      .count()
    assert(math.abs(kept / total - 0.1) < 0.05, s"kept $kept of $total")
  }
}
