package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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

  /** Make `table` creatable from scratch regardless of prior-JVM state:
    * drop any catalog entry AND delete the default-warehouse location.
    *
    * With the default in-memory catalog, a managed table's directory
    * survives a JVM restart while the catalog entry does not — so a
    * re-run's `saveAsTable` takes the CREATE path and throws
    * `LOCATION_ALREADY_EXISTS` (the round-10 io05 failure: the driver
    * runs `sbt test` then Verify in the same working tree). The DROP
    * alone is a no-op on a fresh catalog, which is exactly the trap;
    * the location delete is what restores hermeticity. Every managed
    * `saveAsTable` in this repo must route through here. */
  def freshManagedTable(spark: SparkSession, table: String): Unit = {
    val parts = table.split('.')
    require(parts.nonEmpty && parts.length <= 2,
      s"freshManagedTable: expected [db.]table, got '$table'")
    spark.sql(
      s"DROP TABLE IF EXISTS ${parts.map(p => s"`$p`").mkString(".")}")
    // Default-warehouse layout: <warehouse>/<table> for the default
    // database, <warehouse>/<db>.db/<table> for a qualified name.
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val rel = (if (parts.length == 2) s"${parts(0)}.db/" else "") +
      parts.last
    val loc = new org.apache.hadoop.fs.Path(
      warehouse, rel.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Write `df` as a bucketed+sorted managed parquet table. Bucketing
    * requires `saveAsTable` (the bucket spec lives in the catalog);
    * [[freshManagedTable]] first, so the write is hermetic across JVMs
    * sharing a warehouse directory. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit = {
    freshManagedTable(df.sparkSession, table)
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Write `df` hive-partitioned by `partCol` at `path`. Reads that filter
    * on the partition column prune whole directories at planning time
    * (static partition pruning) — at 100 TB, a date-partitioned fact table
    * turns a time-range query from a full scan into a handful of
    * partitions; joins against a filtered dim get the same effect at
    * runtime via dynamic partition pruning. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .parquet(path)

  /** Morton (z-order) interleave of two non-negative `bits`-bit keys:
    * bit j of `x` lands at position 2j, bit j of `y` at 2j+1, so sorting
    * by the result clusters rows that are close in BOTH dimensions — the
    * multi-column clustering trick (Delta/Iceberg `OPTIMIZE ZORDER`)
    * that makes per-file min/max stats selective on every z-ordered
    * column at once, where a single-key sort leaves the second column's
    * bounds at full width in every file. Pure integer bit arithmetic
    * via one fold over the bit positions (no explode, no shuffle);
    * callers range-partition + sort by the value and write
    * (SkewLayoutSpec asserts the resulting file-skipping property).
    * Exact cross-engine: io07's oracle recomputes it in SQL. */
  def zOrderValue(
      x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, j) =>
      acc +
        call_function("shiftleft",
          call_function("shiftright", x, j).bitwiseAND(lit(1L)), j * 2) +
        call_function("shiftleft",
          call_function("shiftright", y, j).bitwiseAND(lit(1L)),
          j * 2 + 1))
  }

  /** Parquet data files under `dir` (recursive; `_`-prefixed metadata and
    * hidden files excluded) with their sizes. */
  private def dataFiles(spark: SparkSession, dir: String)
      : Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val b = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith("."))
        b += ((f.getPath.toString, f.getLen))
    }
    b.result()
  }

  /** Small-file COMPACTION (the OPTIMIZE bin-packing maintenance op): a
    * streaming sink or per-task commit leaves a table as thousands of
    * KB-scale files, and every subsequent scan pays open/footer/seek per
    * file — at 100 TB small files are routinely the difference between a
    * minutes scan and an hours one. Rewrites `inDir` into
    * ceil(totalBytes / targetBytes) files at `outDir` via `coalesce`:
    * NO shuffle — coalesce merges scan splits in-task, so the rewrite
    * cost is one read + one write of the data, the floor for any
    * compaction. (A layout that must also stay sorted/clustered swaps in
    * `repartitionByRange` on the cluster key — one shuffle, same write;
    * z-ordered layouts re-sort by [[zOrderValue]].) Returns (input file
    * count, output partition count) for observability; the rewrite is
    * content-lossless, which io08's hash gate asserts end-to-end. */
  def compactFiles(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val files = dataFiles(spark, inDir)
    val total = files.map(_._2).sum
    val nOut = math.max(1L,
      (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    (files.size, nOut)
  }

  /** INCREMENTAL INGESTION over a landing directory (the Auto
    * Loader / file-notification pattern): a manifest records which data
    * files have been processed, and each run reads ONLY the delta —
    * rows from files absent from the manifest (`input_file_name`
    * anti-joined against the manifest relation, so the filter rides the
    * scan; file names carry writer-task UUIDs and never collide across
    * drops). A missing manifest means nothing is processed yet — the
    * bootstrap read is the full landing dir. Scale: the manifest is a
    * file-count-sized relation (not row-sized); production appends it
    * per commit exactly like a transaction log and the anti-join
    * broadcasts it. */
  def incrementalScan(
      spark: SparkSession,
      landingDir: String,
      manifestDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val all = spark.read.parquet(landingDir)
      .withColumn("_file",
        regexp_extract(input_file_name(), "[^/]+$", 0))
    val mfPath = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = mfPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mfPath)) all.drop("_file")
    else all.join(broadcast(spark.read.parquet(manifestDir)),
      Seq("_file"), "left_anti").drop("_file")
  }

  /** Checkpoint the manifest: record every data file currently in the
    * landing dir as processed. Listing-metadata scale (one row per
    * FILE); overwrite semantics make the pair
    * [[incrementalScan]]→process→markProcessed idempotent per drop. */
  def markProcessed(
      spark: SparkSession,
      landingDir: String,
      manifestDir: String): Unit = {
    import spark.implicits._
    dataFiles(spark, landingDir)
      .map(f => f._1.substring(f._1.lastIndexOf('/') + 1))
      .toDF("_file")
      .write.mode(SaveMode.Overwrite).parquet(manifestDir)
  }

  /** Recursively delete `dir` if present (work-dir hermeticity across
    * JVMs — the io05 lesson applied to landing/manifest state). */
  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
