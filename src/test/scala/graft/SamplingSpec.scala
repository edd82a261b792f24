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

  test("stratified sampling applies per-stratum rates (en down, de whole, " +
    "default for the rest) and stays reproducible") {
    val docs = Tables.t(spark, sf, "documents")
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def keptCounts() = docs
      .filter(Sampling.stratifiedSample(col("text"), col("lang"),
        Map("en" -> "4000", "de" -> "fffff"), default = "c000"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = keptCounts()
    // de: the 'fffff' sentinel keeps the stratum EXACTLY whole ('ffff'
    // alone would drop the ~1/65536 of docs whose md5 prefix is 'ffff')
    assert(kept("de") == before("de"))
    // en: ~25% cut
    assert(math.abs(kept("en").toDouble / before("en") - 0.25) < 0.1,
      s"en kept ${kept("en")} of ${before("en")}")
    // a default-rate stratum: ~75%
    val other = (before.keySet - "en" - "de").head
    assert(math.abs(kept(other).toDouble / before(other) - 0.75) < 0.15,
      s"$other kept ${kept(other)} of ${before(other)}")
    assert(keptCounts() == kept, "stratified cut must be reproducible")
  }

  test("evalSample keeps exactly min(n, stratum size) rows per stratum, " +
    "is layout-independent, and plans a WindowGroupLimit (partial top-n " +
    "per map task, not a full per-stratum sort shuffle)") {
    val docs = Tables.t(spark, sf, "documents")
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def sample(df: org.apache.spark.sql.DataFrame) =
      Sampling.evalSample(df, col("lang"), col("text"), col("doc_id"), 10)
        .select("doc_id", "lang", "rk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = sample(docs)
    val perLang = got.groupBy(_._2).view.mapValues(_.size).toMap
    sizes.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(10L, n), lang)
    }
    // layout independence: a different partitioning yields the same set
    assert(sample(docs.repartition(7)) == got)
    val plan = Sampling
      .evalSample(docs, col("lang"), col("text"), col("doc_id"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing:\n$plan")
  }

  test("token packing: shards respect the budget (first overflowing doc " +
    "opens the next shard), cover every doc, and are deterministic") {
    val docs = Tables.t(spark, sf, "documents")
    val packed = Sampling.packIntoShards(docs,
      TextFunctions.tokenCountWs(col("text")), col("doc_id"),
      budgetTokens = 4096L, buckets = 16)
      .select("doc_id", "bucket", "n_tokens", "shard_id")
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == docs.count())
    // replay each lane in id order: the window's running-sum assignment
    // must equal the sequential first-fit shard assignment
    rows.groupBy(_._2).foreach { case (_, lane) =>
      var cum = 0L
      lane.sortBy(_._1).foreach { case (id, _, nTok, shard) =>
        assert(shard == cum / 4096L,
          s"doc $id expected shard ${cum / 4096} got $shard")
        cum += nTok
      }
    }
    // per-(bucket, shard) token totals exceed the budget only by the one
    // document that opened the overflow (no shard starts past the budget)
    val byShard = rows.groupBy(r => (r._2, r._4))
    byShard.foreach { case ((b, sh), ds) =>
      val tokens = ds.map(_._3).sum
      val maxDoc = ds.map(_._3).max
      assert(tokens < 4096L + maxDoc,
        s"shard ($b,$sh) holds $tokens tokens (max doc $maxDoc)")
    }
    val again = Sampling.packIntoShards(docs,
      TextFunctions.tokenCountWs(col("text")), col("doc_id"), 4096L, 16)
      .select("doc_id", "bucket", "n_tokens", "shard_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet == rows.toSet, "packing must be deterministic")
  }

  test("t44 epoch shuffle: epochs are decorrelated (per-shard orders " +
    "differ between epoch 0 and 1) and every (epoch, shard) rank " +
    "sequence is dense from 1") {
    val out = q("t44_epoch_shuffle").build(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    val byEp = out.groupBy(_._2)
    // same doc population per epoch, but a different assignment
    assert(byEp(0).map(_._1).toSet == byEp(1).map(_._1).toSet)
    val a0 = byEp(0).map(t => t._1 -> ((t._3, t._4))).toMap
    val a1 = byEp(1).map(t => t._1 -> ((t._3, t._4))).toMap
    assert(a0 != a1, "epoch key must change the order")
    // dense ranks: each (epoch, shard) is 1..n with no gaps
    out.groupBy(t => (t._2, t._3)).foreach { case (k, rows) =>
      val rks = rows.map(_._4).sorted.toSeq
      assert(rks == (1L to rks.length).toSeq, s"$k ranks not dense: $rks")
    }
  }
}
