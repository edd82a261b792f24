package graft

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout helpers: bucketed table writes for shuffle-free
  * co-located joins.
  *
  * At 100 TB the dominant cost of a fact-to-fact join (orders ⋈ lineitem)
  * is shuffling both sides on the join key. Writing both tables bucketed
  * by that key (same bucket count) makes the join a per-bucket merge with
  * NO Exchange in the plan — the shuffle is paid once at write time and
  * amortized over every subsequent join. This is the batch analog of the
  * reference's CREATE INDEX intent (`tmp/crud.txt:312-347`): a physical
  * access-path optimization recorded in the catalog; our
  * [[ExecutionContext.createIndex]] keeps the metadata registry, and this
  * materializes the layout.
  */
object Layouts {

  /** Write `df` as a bucketed+sorted managed parquet table. Bucketing
    * requires `saveAsTable` (the bucket spec lives in the catalog). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
