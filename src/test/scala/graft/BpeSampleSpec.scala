package graft

import org.apache.spark.sql.functions._

/** The BPE sampled-vocabulary production path
  * ([[CorpusStats.bpeMerges]]'s `vocabSampleHex`): training on the
  * content-keyed TYPE sample must be exactly training on the
  * sub-corpus of retained types — the property that makes the sampled
  * model trustworthy at scale, where the full-vocab train is
  * driver-pacing-prohibitive.
  */
class BpeSampleSpec extends SparkSpec {

  private def sennrich = {
    val sq = spark; import sq.implicits._
    Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
  }

  private def mergeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  test("a threshold above every hash keeps the full vocabulary: " +
    "sampled training equals unsampled training merge-for-merge") {
    val full = mergeRows(CorpusStats.bpeMerges(sennrich, nMerges = 4))
    val all = mergeRows(CorpusStats.bpeMerges(sennrich, nMerges = 4,
      vocabSampleHex = Some("fffff")))
    assert(all == full && full.nonEmpty)
    ManagedCache.releaseAll()
  }

  test("sampled training IS sub-corpus training: merges under a " +
    "dropping threshold equal full-vocab merges on the corpus " +
    "restricted to the retained word types") {
    val sq = spark; import sq.implicits._
    // threshold at the median word-type hash: retains a strict,
    // non-empty subset of {low, lower, newest, widest}
    val hashes = Seq("low", "lower", "newest", "widest").map(w =>
      w -> spark.range(1).select(
        substring(md5(lit(w)), 1, 4)).head.getString(0)).toMap
    val threshold = hashes.values.toSeq.sorted.apply(2)
    val keptWords = hashes.filter(_._2 < threshold).keys.toSet
    assert(keptWords.nonEmpty && keptWords.size < 4,
      s"fixture must split: $hashes vs $threshold")
    val sampled = mergeRows(CorpusStats.bpeMerges(sennrich, nMerges = 4,
      vocabSampleHex = Some(threshold)))
    // the same corpus with the dropped types physically removed
    val sub = sennrich.select(col("doc_id"),
      concat_ws(" ", filter(split(col("text"), " "),
        w => w.isInCollection(keptWords))).as("text"))
      .filter(length(col("text")) > 0)
    val subFull = mergeRows(CorpusStats.bpeMerges(sub, nMerges = 4))
    assert(sampled == subFull && sampled.nonEmpty,
      s"sampled=$sampled sub=$subFull kept=$keptWords")
    ManagedCache.releaseAll()
  }

  test("the sampled model still encodes the full corpus: t27's entry " +
    "shape (sample-trained merges, corpus-wide bpeEncode) returns a " +
    "row per document with subwords >= words") {
    val merges = CorpusStats.bpeMerges(sennrich, nMerges = 4,
        vocabSampleHex = Some("c000"))
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = CorpusStats.bpeEncode(sennrich, merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.length == 2)
    enc.foreach { case (_, words, subs) => assert(subs >= words) }
    ManagedCache.releaseAll()
  }
}
