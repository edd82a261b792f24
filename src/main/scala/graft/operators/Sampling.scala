package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * Both operators key on a CONTENT hash prefix (md5 — available and
  * byte-identical in the DuckDB oracle, unlike xxhash64), compared as a
  * fixed-width lowercase hex string: lexicographic order equals numeric
  * order, so `prefix < 'cccc'` is an exact 0xcccc/0x10000 ≈ 80% cut.
  *
  * Why this beats `df.sample` / `rand()` at 100 TB:
  *  - REPRODUCIBLE: the same row lands on the same side of the cut on any
  *    cluster shape, partition layout, or rerun — `df.sample` re-draws
  *    when partitioning changes, `rand()` re-draws per execution.
  *  - LEAKAGE-FREE under duplication: keying on content (not row id) puts
  *    byte-identical duplicate documents in the SAME split, so a test set
  *    never contains a copy of a training document.
  *  - One scan, no shuffle: the split is a per-row expression; writing
  *    out splits is a partitioned write on the split column.
  */
object Sampling {

  private def hexPrefix(key: Column): Column = substring(md5(key), 1, 4)

  /** Keep rows whose content-hash prefix falls below `hexThreshold`
    * (4 lowercase hex digits; fraction kept ≈ 0x<threshold>/0x10000). */
  def deterministicSample(key: Column, hexThreshold: String): Column =
    hexPrefix(key) < lit(hexThreshold)

  /** 3-way split column: 'train' below `trainTo`, 'val' below `valTo`,
    * else 'test' (e.g. 'cccc'/'e666' ≈ 80/10/10). */
  def deterministicSplit(
      key: Column,
      trainTo: String = "cccc",
      valTo: String = "e666"): Column = {
    val p = hexPrefix(key)
    when(p < lit(trainTo), "train")
      .when(p < lit(valTo), "val")
      .otherwise("test")
  }
}

/** Driver-facing sampling queries over `documents`. */
object SamplingQueries {
  val queries: Seq[Q] = Seq(

    // Reproducible 80/10/10 content-keyed split, summarized per (lang,
    // split) so the oracle hashes the full assignment.
    Q("t10_det_split",
      (s, d) =>
        Tables.t(s, d, "documents")
          .withColumn("split", Sampling.deterministicSplit(col("text")))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n"),
            min(col("doc_id")).as("min_doc")),
      Some("""SELECT lang,
             |CASE WHEN substr(md5(text), 1, 4) < 'cccc' THEN 'train'
             |WHEN substr(md5(text), 1, 4) < 'e666' THEN 'val'
             |ELSE 'test' END AS split,
             |count(*) AS n, min(doc_id) AS min_doc
             |FROM documents GROUP BY 1, 2"""
        .stripMargin.replace('\n', ' ')))
  )
}
