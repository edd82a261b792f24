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

  /** FILE-LEVEL MIN/MAX DATA SKIPPING, write side: range-partition +
    * sort `df` by `keyCol` into ~`nFiles` files under `dir/data`, then
    * restate each file's (min, max, rows) on the key as a parquet stats
    * manifest under `dir/_filestats` — the per-file stats block every
    * lakehouse log (Delta `stats`, Iceberg manifest entries) carries.
    * The sort is what makes the stats SELECTIVE: each file owns a
    * narrow, near-disjoint key range, so a point/range predicate
    * intersects few files. A real log collects the stats in the writer
    * itself; the one-pass restatement here reads back what was written,
    * which is the same information one scan later. */
  def writeWithStats(
      spark: SparkSession, df: DataFrame, dir: String,
      keyCol: String, nFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    deleteDir(spark, s"$dir/data")
    deleteDir(spark, s"$dir/_filestats")
    df.repartitionByRange(nFiles, df(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/data")
    spark.read.parquet(s"$dir/data")
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        count(lit(1)).as("n_rows"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/_filestats")
  }

  /** FILE-LEVEL MIN/MAX DATA SKIPPING, read side: prune the FILE LIST
    * from the stats manifest before the scan even plans — only files
    * whose [min_key, max_key] intersects [lo, hi] are handed to the
    * reader. This is planning-time listing reduction on a NON-partition
    * column (the mechanism behind Delta/Iceberg data skipping): distinct
    * from partition pruning (io03/io17 — needs the column in the path)
    * and from parquet row-group skipping (io07 — the reader still opens
    * every file's footer). At 100 TB with millions of files, not
    * touching the excluded files' footers IS the win. The driver-side
    * collect is file-count-sized metadata — the log read every
    * lakehouse planner performs — never data. Returns (frame, files
    * read, files total) so callers can assert the skipping happened. */
  def skippingScan(
      spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions._
    val stats = spark.read.parquet(s"$dir/_filestats")
    val total = stats.count().toInt
    val keep = stats
      .filter(!(col("max_key") < lo || col("min_key") > hi))
      .select("file").collect().map(_.getString(0))
    val pred = col(keyCol) >= lo && col(keyCol) <= hi
    val df =
      if (keep.isEmpty) // schema from the full layout, zero rows
        spark.read.parquet(s"$dir/data").filter(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*).filter(pred)
    (df, keep.length, total)
  }

  /** Z-ORDERED MULTI-COLUMN DATA SKIPPING, write side (the
    * `OPTIMIZE ZORDER BY (a, b)` kernel): quantize BOTH columns to grid
    * cells, interleave the cells with [[zOrderValue]], range-partition +
    * sort by the curve value, and restate each file's (min, max) ON EACH
    * ORIGINAL COLUMN into a parquet stats manifest under
    * `dir/_filestats`. A single-key sort ([[writeWithStats]]) makes the
    * stats selective on ONE column and leaves every other column's
    * per-file bounds at full width; the space-filling curve keeps rows
    * that are close in EITHER dimension in the same few files, so the
    * SAME manifest prunes on BOTH columns — at 100 TB that is one
    * layout serving two query families instead of two copies of the
    * table.
    *
    * Quantization is QUANTILE-BASED by default (`quantize="quantile"`):
    * cell boundaries are ~equi-depth `approxQuantile` cuts (one extra
    * pass at write time, two ≤256-double driver arrays — bounded
    * metadata, never data), so every cell holds ≈1/cells of the ROWS
    * regardless of the value distribution. The alternative linear
    * min/max mapping (`quantize="linear"`, one agg, two scalars) is
    * cheaper but SKEW-FRAGILE: one 6-sigma outlier stretches the grid
    * until the real data collapses into a single cell and the manifest
    * loses all selectivity on that column — at 100 TB an outlier row is
    * a certainty, so equi-depth is the default and SkewLayoutSpec holds
    * the contrast. Per-row mapping is a fold over the boundary array
    * (codegen'd, O(cells) with cells ≤ 256 — a write-time cost only). */
  def writeZOrdered(
      spark: SparkSession, df: DataFrame, dir: String,
      colA: String, colB: String, nFiles: Int, bits: Int = 16,
      quantize: String = "quantile"): Unit = {
    import org.apache.spark.sql.functions._
    deleteDir(spark, s"$dir/data")
    deleteDir(spark, s"$dir/_filestats")
    val z = quantize match {
      case "quantile" =>
        // equi-depth boundaries; file-level skipping saturates long
        // before per-column resolution exceeds the file count, so the
        // grid is capped at 256 cells (8 bits) per column
        val cellBits = math.min(bits, 8)
        val cells = 1 << cellBits
        val probs = (1 until cells).map(_.toDouble / cells).toArray
        val cast = df.select(
          col(colA).cast("double").as("__qa"),
          col(colB).cast("double").as("__qb"))
        val Array(bndA, bndB) =
          cast.stat.approxQuantile(Array("__qa", "__qb"), probs, 0.001)
        // cell index = #boundaries ≤ value (a codegen'd searchsorted);
        // NULLs and empty/constant columns land in cell 0
        def cell(c: String, bnds: Array[Double]) =
          if (bnds.isEmpty) lit(0L)
          else aggregate(typedLit(bnds.toSeq), lit(0L), (acc, b) =>
            acc + when(col(c).cast("double") >= b, 1L).otherwise(0L))
        zOrderValue(cell(colA, bndA), cell(colB, bndB), cellBits)
      case "linear" =>
        val b = df.agg(
          min(col(colA)).cast("double"), max(col(colA)).cast("double"),
          min(col(colB)).cast("double"), max(col(colB)).cast("double"))
          .collect().head
        val top = (1L << bits) - 1
        // an empty table or an all-NULL column has no extrema — every
        // row (there may be none) maps to cell 0 rather than NPE'ing
        def ext(i: Int): Double = if (b.isNullAt(i)) 0d else b.getDouble(i)
        def cell(c: String, lo: Double, hi: Double) =
          if (hi <= lo) lit(0L) // constant column: every row in cell 0
          else least(lit(top), greatest(lit(0L),
            ((col(c).cast("double") - lo) / (hi - lo) * top).cast("long")))
        zOrderValue(
          cell(colA, ext(0), ext(1)),
          cell(colB, ext(2), ext(3)), bits)
      case other => throw new IllegalArgumentException(
        s"writeZOrdered: unknown quantize mode '$other' " +
          "(quantile | linear)")
    }
    df.repartitionByRange(nFiles, z).sortWithinPartitions(z)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/data")
    spark.read.parquet(s"$dir/data")
      .groupBy(input_file_name().as("file"))
      .agg(
        min(col(colA)).as(s"min_$colA"), max(col(colA)).as(s"max_$colA"),
        min(col(colB)).as(s"min_$colB"), max(col(colB)).as(s"max_$colB"),
        count(lit(1)).as("n_rows"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/_filestats")
  }

  /** Read side of [[writeZOrdered]]: prune the file list on ANY column
    * the manifest carries (`min_<col>`/`max_<col>` pairs), then apply
    * the exact predicate. Same planning-time listing reduction as
    * [[skippingScan]], generalized to the multi-column manifest — the
    * caller picks whichever z-ordered column the query constrains. */
  def skippingScanOn(
      spark: SparkSession, dir: String, keyCol: String,
      lo: Double, hi: Double): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions._
    val stats = spark.read.parquet(s"$dir/_filestats")
    require(stats.columns.contains(s"min_$keyCol"),
      s"skippingScanOn: manifest carries no stats for column '$keyCol' " +
        s"(have: ${stats.columns.mkString(", ")})")
    val total = stats.count().toInt
    val keep = stats
      .filter(!(col(s"max_$keyCol") < lo || col(s"min_$keyCol") > hi))
      .select("file").collect().map(_.getString(0))
    val pred = col(keyCol) >= lo && col(keyCol) <= hi
    val df =
      if (keep.isEmpty) spark.read.parquet(s"$dir/data").filter(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*).filter(pred)
    (df, keep.length, total)
  }

  /** Parquet data files under `dir` (recursive; `_`-prefixed metadata and
    * hidden files excluded) with their sizes. */
  private def dataFiles(spark: SparkSession, dir: String)
      : Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // A landing dir that nothing has dropped into yet is an EMPTY
    // listing, not an error — the first ingestion cycle runs before any
    // producer has created the directory.
    if (!fs.exists(p)) return Seq.empty
    val it = fs.listFiles(p, true)
    val rootUri = fs.makeQualified(p).toUri
    val b = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      // hidden-ness applies to EVERY path segment below the root, not
      // just the leaf: a producer mid-write (or crashed) leaves
      // _temporary/.../part-00000.parquet whose BASENAME is clean — a
      // leaf-only filter listed those uncommitted files, read torn
      // footers, and recorded manifest paths that the producer's job
      // commit then moved (re-ingesting the rows under the final path).
      // spark.read.parquet skips these; the hand-rolled lister must too.
      val rel = rootUri.relativize(f.getPath.toUri).getPath
      val hidden = rel.split('/')
        .exists(s => s.startsWith("_") || s.startsWith("."))
      if (!hidden) b += ((f.getPath.toString, f.getLen))
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
    // dataFiles tolerates a missing/metadata-only dir (first maintenance
    // cycle before any append); compaction of nothing is a no-op, not a
    // PATH_NOT_FOUND crash out of spark.read below
    if (files.isEmpty) return (0, 0)
    val total = files.map(_._2).sum
    val nOut = math.max(1L,
      (total + targetBytes - 1) / targetBytes).toInt
    val src = spark.read.parquet(inDir)
    // coalesce can only MERGE scan splits; when the scan yields fewer
    // partitions than the target bin count (one oversized input file,
    // or bin-packed tiny files), splitting needs the shuffle — without
    // this branch the function would write fewer, oversized files while
    // reporting the planned count (the bin-packing contract broken
    // silently). One plan inspection per maintenance call is fine.
    val parts = src.rdd.getNumPartitions
    val packed = if (parts >= nOut) src.coalesce(nOut)
      else src.repartition(nOut)
    packed.write.mode(SaveMode.Overwrite).parquet(outDir)
    (files.size, nOut)
  }

  /** Canonicalized FULLY-QUALIFIED path — the manifest key AND the read
    * path. Full paths, not basenames: externally-produced drops (no
    * writer-task UUIDs) can repeat a basename across subdirectories, and
    * a basename key would silently drop the second file's rows. The
    * scheme and authority are KEPT: an earlier cut stripped the scheme
    * and folded the authority into the path ('s3a://bucket/landing/f' →
    * '/bucket/landing/f'), so on any authority-bearing filesystem the
    * listing keys were unreadable as paths — invisible on local file:/
    * fixtures, broken on a real cluster. Hadoop's Path normalizes slash
    * runs and dot segments, so two spellings of one file still collide
    * to one key. */
  private def normalizePath(p: String): String =
    new org.apache.hadoop.fs.Path(p).toString

  /** The PRE-qualification manifest key for the same file — scheme
    * stripped, authority folded into the path ('s3a://bucket/landing/f'
    * → '/bucket/landing/f', 'file:/root/x' → '/root/x'). Manifests are
    * append-only logs, so entries written under the old format persist
    * forever; [[deltaPaths]] treats a file as processed if EITHER key
    * form appears, otherwise every pre-upgrade file would miss the
    * anti-join and re-ingest — silent row duplication on upgrade (r13
    * advice). New marks are always written in the qualified format. */
  private def legacyKey(p: String): String = {
    val u = new org.apache.hadoop.fs.Path(p).toUri
    val auth = Option(u.getAuthority).filter(_.nonEmpty)
    auth.fold(u.getPath)(a => s"/$a${u.getPath}")
  }

  /** ONE listing snapshot of the landing dir — the unit an
    * incremental-ingestion cycle operates on. Take it once and pass the
    * SAME value to [[incrementalScan]] and [[markProcessed]]: re-listing
    * at checkpoint time would mark files that landed mid-processing as
    * done without ever reading them (lost data, the classic
    * check-then-act race). */
  def snapshotListing(spark: SparkSession, dir: String): Seq[String] =
    dataFiles(spark, dir).map(f => normalizePath(f._1))

  /** The manifest as a RELATION (one `_file` string column) — the
    * processed-file log read as a table, never collected whole. A
    * missing manifest is the empty relation (bootstrap). */
  private def manifestDf(
      spark: SparkSession, manifestDir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty[String].toDF("_file")
    else spark.read.parquet(manifestDir).toDF("_file")
  }

  /** The cycle's unprocessed paths: `listing` LEFT ANTI JOIN manifest,
    * computed IN THE PLAN — the manifest (files-ever-processed, millions
    * of rows at 100 TB) never materializes on the driver; only the
    * anti-join's output does, and that is bounded by the cycle's new-file
    * count, the same driver footprint any file-source read (a path list)
    * already pays. */
  private def deltaPaths(
      spark: SparkSession,
      manifestDir: String,
      listing: Seq[String]): Seq[String] = {
    import spark.implicits._
    if (listing.isEmpty) Seq.empty
    else {
      val manifest = manifestDf(spark, manifestDir)
      // Two anti-joins, one per manifest key format: qualified (current)
      // and legacy scheme-stripped ([[legacyKey]]) — a pre-upgrade
      // manifest keeps suppressing its files. The legacy column is
      // computed driver-side over the LISTING (bounded by one cycle's
      // file count), never over the manifest relation.
      listing.map(f => (f, legacyKey(f))).toDF("_file", "_legacy")
        .join(manifest, Seq("_file"), "left_anti")
        .join(manifest.withColumnRenamed("_file", "_legacy"),
          Seq("_legacy"), "left_anti")
        .select("_file").as[String].collect().toSeq
    }
  }

  /** INCREMENTAL INGESTION over a landing directory (the Auto
    * Loader / file-notification pattern): read ONLY the files in
    * `listing` that the manifest has not recorded — the pruning happens
    * at PLANNING time (the delta paths are the read's input), so
    * processed files are never even opened, stronger than any post-scan
    * filter. A missing manifest bootstraps to the full listing; an
    * empty delta returns the landing schema with zero rows. Scale: the
    * listing-vs-manifest diff is a plan-side anti-join
    * ([[deltaPaths]]); the driver holds only the delta. */
  def incrementalScan(
      spark: SparkSession,
      landingDir: String,
      manifestDir: String,
      listing: Seq[String]): DataFrame = {
    val delta = deltaPaths(spark, manifestDir, listing)
    if (delta.nonEmpty) spark.read.parquet(delta: _*)
    else {
      // Zero-row result, but keep the landing schema when the dir
      // exists; before the first drop ever lands there is no schema to
      // give (first cycle runs before any producer created the dir), so
      // the empty 0-column relation is the honest answer — not a throw.
      val p = new org.apache.hadoop.fs.Path(landingDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) spark.read.parquet(landingDir).limit(0)
      else spark.emptyDataFrame
    }
  }

  /** Checkpoint `listing` as processed by APPENDING its unrecorded
    * paths to the manifest log. The manifest is append-only — no
    * delete, no rename-swap — so there is no instant at which a crash
    * can lose previously-recorded state: a failed append leaves only
    * `_`-prefixed temporary files (excluded by every reader) and the
    * next cycle simply re-appends. The anti-join delta (not the raw
    * listing) is what gets appended, which keeps a replayed old
    * snapshot from duplicating rows — monotonicity by construction.
    * Cycle-count small files accumulate like any transaction log;
    * periodic maintenance can fold the log through [[compactFiles]]
    * into a fresh dir and switch over.
    *
    * Crash-window taxonomy (spec'd in BucketingSpec's debris test):
    * a crash BEFORE task commit leaves only nested `_temporary`
    * attempt dirs — invisible to every reader, deleted by the next
    * append's job cleanup; a crash AFTER task commit but before job
    * commit leaves a fully-written parquet under `_temporary/0/task_*`,
    * which the next append's FileOutputCommitter sweeps into the log —
    * i.e. it COMPLETES the interrupted append. The swept rows are the
    * interrupted delta, and [[deltaPaths]]' anti-join gives the log
    * SET semantics, so the sweep (or a re-append after a pre-commit
    * crash) is idempotent either way. */
  def markProcessed(
      spark: SparkSession,
      manifestDir: String,
      listing: Seq[String]): Unit = {
    import spark.implicits._
    val delta = deltaPaths(spark, manifestDir, listing)
    if (delta.nonEmpty)
      delta.toDF("_file").coalesce(1)
        .write.mode(SaveMode.Append).parquet(manifestDir)
  }

  /** Recursively delete `dir` if present (work-dir hermeticity across
    * JVMs — the io05 lesson applied to landing/manifest state). */
  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
