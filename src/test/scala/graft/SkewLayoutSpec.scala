package graft

import org.apache.spark.sql.functions._

/** Skew salting correctness + partition-pruning layout tests. */
class SkewLayoutSpec extends SparkSpec {

  test("salted aggregation equals the plain aggregation on a skewed frame") {
    val sq = spark; import sq.implicits._
    // 10k rows where key 0 holds 50% of the data — the skew shape
    val skewed = spark.range(10000)
      .select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 50).as("k"),
        (col("id") % 97).cast("double").as("v"))
    val plain = skewed.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(skewed, "k", "v", salts = 8)
      .orderBy("k").collect()
    assert(plain.map(_.toSeq).toSeq == salted.map(_.toSeq).toSeq)
  }

  test("salt spreads a hot key even when all its rows share one value " +
    "(the value-derived-salt degeneration)") {
    val skewed = spark.range(10000)
      .select(lit(0L).as("k"), lit(7.0).as("v")) // one key, one value
    val partials = Skew.saltedPartials(skewed, "k", "v", salts = 8)
    // value-derived salt would collapse this to ONE partial row
    assert(partials.count() > 1, "hot key must spread across salt buckets")
    // and the final result is still exact
    val r = Skew.saltedAgg(skewed, "k", "v", salts = 8).collect().head
    assert(r.getAs[Double]("sum_value") == 70000.0 && r.getAs[Long]("n") == 10000L)
  }

  test("salted join equals the plain join (row multiset) under skew") {
    val sq = spark; import sq.implicits._
    val big = spark.range(5000)
      .select(when(col("id") % 2 === 0, 0L).otherwise(col("id") % 20)
        .as("bk"), col("id").as("payload"))
    val small = spark.range(20).select(col("id").as("sk"),
      concat(lit("dim_"), col("id")).as("name"))
    val plain = big.join(small, col("bk") === col("sk"))
      .select("payload", "name").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val salted = Skew.saltedJoin(big, small, "bk", "sk", salts = 8)
      .select("payload", "name").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(plain == salted)
  }

  test("partitioned layout prunes partitions at the scan") {
    val path = Dml.work("layout_part", sf) + "/orders_by_year"
    val orders = Tables.t(spark, sf, "orders")
      .withColumn("y", year(col("o_orderdate")))
    Layouts.writePartitioned(orders, path, "y")
    val filtered = spark.read.parquet(path).filter(col("y") === 1997)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(400))
    // pruning actually cut the data: one year's rows, not the table
    val all = orders.count()
    val one = filtered.count()
    assert(one > 0 && one < all)
  }

  test("z-order layout: a narrow filter on the SECOND dimension returns " +
    "rows from fewer files than the first-dimension-sorted layout of " +
    "the same data (the multi-column data-skipping property)") {
    val base = Dml.work("layout_zorder", sf)
    val df = Tables.t(spark, sf, "orders").select(
        col("o_orderkey"),
        (col("o_custkey") % 65536).as("x"),
        (datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long") % 65536).as("y"))
      .withColumn("z", Layouts.zOrderValue(col("x"), col("y")))
    val nFiles = 8
    df.repartitionByRange(nFiles, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(s"$base/zorder")
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$base/xsort")
    // a narrow window on y — 1/16th of its observed range
    val Array(ylo, yhi) = df.agg(min("y"), max("y")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val mid = (ylo + yhi) / 2
    val half = math.max((yhi - ylo) / 32, 1L)
    def filesReturningRows(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("y").between(mid - half, mid + half))
        .select(input_file_name()).distinct().count()
    val zTouched = filesReturningRows(s"$base/zorder")
    val xTouched = filesReturningRows(s"$base/xsort")
    // x-sorted files each span the full y range, so the y-slice hits
    // (nearly) all of them; z-ordered files cluster y too
    assert(zTouched > 0)
    assert(zTouched < xTouched,
      s"z-order must concentrate the y-slice: z=$zTouched x=$xTouched")
  }

  test("file-level stats skipping: the manifest prunes the FILE LIST " +
    "before the scan plans (files read < files total), the pruned read " +
    "equals the full-scan filter row for row, and a miss range reads " +
    "ZERO files with the right schema") {
    val dir = Dml.work("layout_statskip", sf)
    val li = Tables.t(spark, sf, "lineitem")
    Layouts.writeWithStats(spark, li, dir, "l_orderkey", 16)
    val (lo, hi) = (100L, 2000L)
    val (pruned, kept, total) =
      Layouts.skippingScan(spark, dir, "l_orderkey", lo, hi)
    assert(total >= 8, s"need a multi-file layout: $total")
    assert(kept > 0 && kept < total,
      s"the narrow range must skip files: read $kept of $total")
    val full = li.filter(col("l_orderkey").between(lo, hi))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty,
      "pruning must be lossless against the plain filter")
    // a range past every file's max: zero files, empty frame, full schema
    val maxKey = li.agg(max("l_orderkey")).collect().head.getLong(0)
    val (missDf, missKept, _) = Layouts.skippingScan(
      spark, dir, "l_orderkey", maxKey + 10, maxKey + 20)
    assert(missKept == 0 && missDf.isEmpty)
    assert(missDf.schema == spark.read.parquet(s"$dir/data").schema)
  }

  test("z-order quantization is SKEW-PROOF: with a 6-sigma outlier in " +
    "one column, linear min/max quantization collapses the dense mass " +
    "into one grid cell (files-read == files-total, no selectivity) " +
    "while the default equi-depth quantile boundaries keep pruning") {
    val root = Dml.work("layout_zskew", sf)
    // dense values in [0, 1000) on both axes (hash-decorrelated), plus
    // ONE outlier at 10^12 — the row that stretches a linear grid until
    // every real value lands in cell 0
    val dense = spark.range(60000).select(
      pmod(hash(col("id")), lit(1000)).cast("long").as("xk"),
      pmod(hash(col("id") * 7 + 3), lit(1000)).cast("long").as("yk"))
    val skewed = dense.union(
      spark.range(1).select(lit(1000000000000L).as("xk"),
        lit(500L).as("yk")))
    val linDir = s"$root/linear"
    val qDir = s"$root/quantile"
    Layouts.writeZOrdered(spark, skewed, linDir, "xk", "yk", 16,
      quantize = "linear")
    Layouts.writeZOrdered(spark, skewed, qDir, "xk", "yk", 16)
    val (linDf, linKept, linTotal) =
      Layouts.skippingScanOn(spark, linDir, "xk", 100d, 200d)
    val (qDf, qKept, qTotal) =
      Layouts.skippingScanOn(spark, qDir, "xk", 100d, 200d)
    assert(linTotal >= 8 && qTotal >= 8,
      s"need multi-file layouts: $linTotal / $qTotal")
    // linear: the outlier owns the whole grid range; every dense row is
    // cell 0 on xk, so the curve orders by yk alone and every file
    // spans the full dense xk range — zero pruning
    assert(linKept == linTotal,
      s"linear quantization must have LOST xk selectivity to the " +
        s"outlier (read $linKept of $linTotal)")
    // quantile: boundaries are equi-depth over the data, the outlier
    // only shifts the last cut — the narrow window still skips files
    assert(qKept > 0 && qKept < qTotal,
      s"quantile boundaries must keep pruning: read $qKept of $qTotal")
    assert(qKept < linKept)
    // both remain lossless against the plain filter
    val full = skewed.filter(col("xk").between(100L, 200L))
    for (df <- Seq(linDf, qDf))
      assert(df.exceptAll(full).isEmpty && full.exceptAll(df).isEmpty,
        "pruned reads must stay lossless")
  }

  test("z-ordered stats skipping: ONE layout's manifest prunes the file " +
    "list on EITHER clustered column (the multi-column property a " +
    "single-key sort cannot give), losslessly, and a single-key-sorted " +
    "control of the same data cannot prune the second column") {
    val dir = Dml.work("layout_zskip", sf)
    val li = Tables.t(spark, sf, "lineitem")
    Layouts.writeZOrdered(spark, li, dir, "l_orderkey", "l_partkey", 16)
    // narrow windows (1/8 of each column's observed range, off the low
    // edge) — sized to the fixture, not hard-coded key values, so the
    // spec holds at any sf
    val ext = li.agg(
      min("l_orderkey").cast("double"), max("l_orderkey").cast("double"),
      min("l_partkey").cast("double"), max("l_partkey").cast("double"))
      .collect().head
    def window(lo: Double, hi: Double): (Double, Double) = {
      val w = math.max((hi - lo) / 8, 1d)
      (lo + w / 2, lo + w / 2 + w)
    }
    val (aLo, aHi) = window(ext.getDouble(0), ext.getDouble(1))
    val (bLo, bHi) = window(ext.getDouble(2), ext.getDouble(3))
    val (onA, keptA, totalA) =
      Layouts.skippingScanOn(spark, dir, "l_orderkey", aLo, aHi)
    val (onB, keptB, totalB) =
      Layouts.skippingScanOn(spark, dir, "l_partkey", bLo, bHi)
    assert(totalA >= 8 && totalA == totalB, s"multi-file layout: $totalA")
    assert(keptA > 0 && keptA < totalA,
      s"first-column range must skip files: read $keptA of $totalA")
    assert(keptB > 0 && keptB < totalB,
      s"SECOND-column range must skip files too: read $keptB of $totalB")
    // lossless on both columns vs the plain filter
    val fullA = li.filter(col("l_orderkey").between(aLo, aHi))
    val fullB = li.filter(col("l_partkey").between(bLo, bHi))
    assert(onA.exceptAll(fullA).isEmpty && fullA.exceptAll(onA).isEmpty)
    assert(onB.exceptAll(fullB).isEmpty && fullB.exceptAll(onB).isEmpty)
    // control: the io18 single-key layout on l_orderkey leaves every
    // file's l_partkey bounds at (nearly) full width — the same
    // second-column window prunes nothing (or close to it)
    val ctl = Dml.work("layout_zskip_ctl", sf)
    Layouts.writeWithStats(spark, li, ctl, "l_orderkey", 16)
    val ctlTouched = spark.read.parquet(s"$ctl/data")
      .filter(col("l_partkey").between(bLo, bHi))
      .select(input_file_name()).distinct().count()
    assert(keptB < ctlTouched,
      s"z-order must beat the single-key sort on the second column: " +
        s"z=$keptB vs single-key=$ctlTouched")
  }

  test("AQE splits a skewed join partition at runtime (the no-code-change " +
    "complement to k02's explicit salting: OptimizeSkewedJoin marks the " +
    "sort-merge join skew=true and the result stays exact)") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of 200k rows land on key 0 — one shuffle partition dwarfs
      // the rest, the shape that stalls a stage on one straggler task
      val left = spark.range(200000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
      val right = spark.range(100).toDF("k")
      val joined = left.join(right, "k")
      // collect() (not count()) so the adaptive plan finalizes on THIS
      // QueryExecution — count() builds its own and leaves this one
      // isFinalPlan=false
      val n = joined.collect().length
      assert(n == 200000, s"join must stay exact under skew handling: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin must fire:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sorted parquet prunes ROW GROUPS at the scan: a point filter " +
    "on the sort key reads a small fraction of the file's rows (the " +
    "min/max-stats skip that makes selective scans cheap at 100 TB)") {
    val dir = Dml.work("rg_spec", sf) + "_rg"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // one file, sorted by k, small row groups -> many prunable units
    spark.range(0, 500000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .coalesce(1).sortWithinPartitions("k")
      .write.option("parquet.block.size", 65536).parquet(dir)
    val df = spark.read.parquet(dir).filter(col("k") === 123456L)
    // collect() (not count()) so metrics land on THIS QueryExecution
    val hit = df.collect()
    assert(hit.length == 1 && hit.head.getLong(1) == 123456L % 97)
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned < 100000,
      s"stats must skip most row groups: scanned $scanned of 500000")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,"),
      s"filter must reach the parquet reader:\n${plan.take(600)}")
  }

  test("k03 path: withSkewConfs scopes the aggressive thresholds and " +
    "restores them after; aqeSkewJoin's MERGE hints pin the sort-merge " +
    "join so the runtime skew split fires on it") {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val before = spark.conf.getOption(key)
    val plan = Skew.withSkewConfs(spark) {
      assert(spark.conf.get(key) == "16384", "scope must be active")
      val left = spark.range(200000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100).as("hk"),
        col("id").as("p"))
      val dim = spark.range(100).select(col("id").as("dk"),
        concat(lit("d"), col("id")).as("dname"))
      val j = Skew.aqeSkewJoin(left, dim, "hk", "dk")
      val n = j.collect().length // finalize THIS QueryExecution's plan
      assert(n == 200000, s"join must stay exact under the split: $n")
      j.queryExecution.executedPlan.toString
    }
    assert(plan.contains("SortMergeJoin"),
      s"MERGE hint must pin SMJ:\n${plan.take(800)}")
    assert(plan.contains("skew=true"),
      s"runtime skew split must fire:\n${plan.take(1200)}")
    assert(spark.conf.getOption(key) == before,
      "withSkewConfs must restore the session value")
  }

  test("k03 ENTRY shape: the lineitem-based probe (leading uniform-key " +
    "repartition standing in for production mapper parallelism) gets the " +
    "runtime skew split — the committed PLANS.md evidence, asserted live") {
    val joined = Skew.withSkewConfs(spark, Skew.advisoryFor(spark, sf, "lineitem")) {
      val dim = spark.range(0, 50).select(col("id").as("dk"),
        concat(lit("d"), col("id")).as("dname"))
      val j = Skew.aqeSkewJoin(Skew.k03Big(spark, sf), dim, "hk", "dk")
        .select("l_orderkey", "l_linenumber", "hk", "dname")
      val n = j.collect().length // finalize THIS QueryExecution's plan
      val expected = spark.read.parquet(s"$sf/lineitem.parquet").count()
      assert(n == expected, s"join must stay row-exact: $n vs $expected")
      j
    }
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"),
      s"entry shape must carry the skew-split SMJ:\n${plan.take(1200)}")
  }

  test("AQE converts a planned sort-merge join to broadcast at runtime " +
    "when the built side turns out tiny (the selective-filter case " +
    "static stats cannot see)") {
    val confs = Seq(
      // static stats say both sides are big -> SMJ planned
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // ...but the RUNTIME size of the filtered side is tiny
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1MB",
      "spark.sql.adaptive.localShuffleReader.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(200000).select((col("id") % 1000).as("k"),
        col("id").as("payload"))
      // selective filter: 1000 planned rows shrink to 10 at runtime
      val dim = spark.range(1000).toDF("k").filter(col("k") < 10)
      val joined = big.join(dim, "k")
      val n = joined.collect().length
      assert(n == 2000, s"join must stay exact under AQE replan: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"AQE must convert the SMJ to broadcast:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("compaction bin-packs a 64-file fragmented layout into the byte " +
    "target and preserves the exact row multiset") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val frag = s"$base/frag"
    val comp = s"$base/compact"
    val df = Tables.t(spark, sf, "documents")
    df.repartition(64).write.mode("overwrite").parquet(frag)
    def files(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles.toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files(frag).size == 64)
    val (nIn, nOut) = Layouts.compactFiles(spark, frag, comp)
    assert(nIn == 64)
    // whole corpus is far under one 128 MB target bin
    assert(nOut == 1 && files(comp).size == 1,
      s"expected one packed file, got $nOut planned / ${files(comp).size}")
    // content-lossless: row multiset identical both ways
    val a = spark.read.parquet(comp)
    assert(a.count() == df.count())
    assert(a.exceptAll(df).isEmpty && df.exceptAll(a).isEmpty)
    // a tighter byte target yields multiple bins — and the PHYSICAL
    // file count must match the planned one even when the scan packs
    // the tiny inputs into fewer splits than the target (the
    // repartition branch)
    val total = files(frag).map(_.length).sum
    val (_, n4) = Layouts.compactFiles(spark, frag, s"$base/c4", total / 4)
    assert(n4 >= 4, s"quarter-size target should plan >=4 bins, got $n4")
    assert(files(s"$base/c4").size == n4,
      s"planned $n4 bins but wrote ${files(s"$base/c4").size} files")
    val b = spark.read.parquet(s"$base/c4")
    assert(b.exceptAll(df).isEmpty && df.exceptAll(b).isEmpty)
  }

  /** Max per-task shuffle-WRITE records across every stage an action
    * runs — the runtime skew signal: a degenerate LSH bucket pairs in
    * ONE task, so its C(n,2) candidate rows all leave that task's
    * shuffle write. Task-end events post asynchronously; poll until the
    * maximum stabilizes rather than reaching into the private listener
    * bus. */
  private def maxTaskShuffleWrite(action: => Unit): Long = {
    val maxW = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) maxW.getAndUpdate(v =>
          math.max(v, m.shuffleWriteMetrics.recordsWritten))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      var last = -1L
      var stable = 0
      var tries = 0
      while (stable < 3 && tries < 50) {
        Thread.sleep(100)
        val now = maxW.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
        tries += 1
      }
      maxW.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("boilerplate stress: a band bucket at >=100x the median is " +
    "dropped by the corpus-side cap — bounded per-task shuffle volume " +
    "(runtime evidence) with full recall on the non-degenerate pairs") {
    val sq = spark; import sq.implicits._
    // 400 documents with IDENTICAL boilerplate text: one shingle set,
    // one signature, so every band key holds all 400 docs (median
    // bucket is 1-2 docs — this is the 100x-median hot key). Background:
    // 100 unique docs, including 3 planted duplicate pairs that near-dup
    // detection MUST still find after the cap.
    val boiler = "terms of service apply to all users of this site " +
      "please read carefully before proceeding with registration"
    val hot = (0 until 400).map(i => (1000L + i, boiler))
    val bg = (0 until 100).map(i =>
      (2000L + i, s"alpha$i bravo$i charlie$i delta$i echo$i " +
        s"foxtrot$i golf$i hotel$i india$i juliet$i"))
    val planted = Seq(
      (3000L, 3001L, "kilo lima mike november oscar papa quebec"),
      (3002L, 3003L, "romeo sierra tango uniform victor whiskey xray"),
      (3004L, 3005L, "yankee zulu one two three four five six"))
    val corpus = (hot ++ bg ++
      planted.flatMap { case (a, b, t) => Seq((a, t), (b, t)) })
      .toDF("doc_id", "text")
    val cap = 50

    val cappedPairs = scala.collection.mutable.Buffer
      .empty[(Long, Long)]
    val cappedMax = maxTaskShuffleWrite {
      cappedPairs ++= Dedup.minhashNearDupPairs(corpus, maxBucket = cap)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
      ManagedCache.releaseAll()
    }
    // recall floor: every planted (non-degenerate) duplicate pair found
    val plantedKeys = planted.map { case (a, b, _) => (a, b) }.toSet
    assert(plantedKeys.subsetOf(cappedPairs.toSet),
      s"capped run lost planted pairs: ${plantedKeys -- cappedPairs.toSet}")
    // the degenerate bucket's pairs are gone (that is the cap's contract)
    assert(!cappedPairs.exists { case (a, b) => a >= 1000 && b < 2000 },
      "hot-bucket pairs must be dropped by the cap")

    var uncapped = 0L
    val uncappedMax = maxTaskShuffleWrite {
      uncapped = Dedup.minhashNearDupPairs(corpus, maxBucket = Int.MaxValue)
        .count()
      ManagedCache.releaseAll()
    }
    // uncapped, the hot clique's C(400,2) candidate rows must flow
    // through the shuffle toward distinct. At this fixture scale the
    // build side broadcasts, so the clique splits across the streamed
    // side's partitions (4 here) instead of landing in ONE (band,bh)
    // task — the per-task floor is C(400,2)/partitions; at corpus scale
    // the join shuffles on the band key and the whole clique IS one
    // task, which is exactly the skew the cap exists to prevent.
    assert(uncapped >= 400L * 399 / 2,
      s"uncapped run should emit the full hot clique, got $uncapped")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(uncappedMax >= 400L * 399 / 2 / parts,
      s"uncappedMax=$uncappedMax")
    // capped, no task's shuffle write carries more than the background
    // volume — the hot clique's quadratic blowup never happens
    assert(cappedMax < 10000,
      s"capped max per-task shuffle write $cappedMax (uncapped $uncappedMax)")
    assert(uncappedMax > 10 * cappedMax,
      s"expected order-of-magnitude spread: $uncappedMax vs $cappedMax")
  }

  test("io13 ORC scan: predicate pushes to the reader and the read " +
    "schema prunes to the selected columns (ORC is analytics-grade, " +
    "not interchange-only)") {
    val dir = Dml.work("io13spec", sf) + "/orders_orc"
    Tables.t(spark, sf, "orders").write.mode("overwrite").orc(dir)
    val narrow = spark.read.orc(dir)
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"), plan.take(600))
    // pruned read schema: neither enum/date column survives to the scan
    assert(!plan.contains("o_orderpriority"), plan.take(600))
    assert(narrow.count() > 0)
  }

  test("io12 binaryFile source: pathGlobFilter excludes non-matching " +
    "files at LISTING time, and a length predicate is pushed") {
    val dir = Dml.work("io12spec", sf) + "/assets"
    Layouts.deleteDir(spark, dir)
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.png"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "b.txt"), Array[Byte](1, 2, 3, 4))
    val pngs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir)
    assert(pngs.count() == 1)
    // the non-matching .txt never reaches the DataFrame at all
    assert(pngs.select("path").collect().head.getString(0).endsWith("a.png"))
    val filtered = spark.read.format("binaryFile").load(dir)
      .filter(col("length") < 4)
    assert(filtered.count() == 1)
  }

  test("io17 dynamic partition pruning: a dim-side-only predicate on an " +
    "independent lookup attribute (statically non-inferable) prunes the " +
    "partitioned fact scan at RUNTIME: the executed plan's only " +
    "PartitionFilter is dynamicpruning, and the scan read 2 of 5 " +
    "partitions") {
    val joined = q("io17_dynamic_partition_pruning").build(spark, sf)
    val rows = joined.collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("1-URGENT", "2-HIGH"), "only the two matching priorities survive")
    // descend AQE stages: FileSourceScanExec lives inside materialized
    // QueryStageExec subtrees, which plain collect() does not enter
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case qs: QueryStageExec => scansOf(qs.plan)
      case f: FileSourceScanExec => Seq(f)
      case _ => Seq.empty
    }
    val dppScans = scansOf(joined.queryExecution.executedPlan)
      .filter(_.metadata.get("PartitionFilters")
        .exists(_.contains("dynamicpruning")))
    assert(dppScans.nonEmpty,
      "the fact scan must carry a runtime dynamicpruning PartitionFilter:\n" +
        joined.queryExecution.executedPlan.toString.take(1200))
    // pruning is RUNTIME-ONLY: the partition filters carry nothing but
    // null-safety and the dynamicpruning subquery (a dim predicate
    // expressible from the join key would transfer statically via
    // constraint inference and the entry would prove nothing about DPP)
    val pf = dppScans.head.metadata("PartitionFilters")
    val residue = pf
      .replaceAll("dynamicpruningexpression\\([^)]*\\)", "")
      .replaceAll("isnotnull\\([^)]*\\)", "")
    assert(!residue.exists(c => c == '<' || c == '>' || c == '='),
      s"partition filters must be runtime-only, found static: $pf")
    // the runtime metric proves partitions were SKIPPED, not post-filtered
    val partsRead = dppScans.head.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(2L),
      s"expected 2 of 5 partitions read, metric said $partsRead " +
        s"(metrics: ${dppScans.head.metrics.keys.mkString(", ")})")
  }

  test("k04 runtime bloom-filter join: a selective dim predicate plants " +
    "might_contain on the FACT side below the shuffle (rows drop before " +
    "they are shuffled), and the filtered result is row-exact") {
    val (plan, n, expected) = Skew.withBloomConfs(spark) {
      val fact = Tables.t(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber")
      val dim = Tables.t(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val n = j.count()
      val expected = Tables.t(spark, sf, "lineitem")
        .join(
          Tables.t(spark, sf, "orders")
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      (j.queryExecution.optimizedPlan.toString, n, expected)
    }
    assert(n == expected && n > 0, s"bloom must be transparent: $n vs $expected")
    assert(plan.contains("might_contain"),
      s"the optimized plan must carry the injected runtime bloom filter:\n" +
        plan.take(1200))
    assert(plan.contains("bloom_filter_agg"),
      "the creation side must aggregate the filtered dim keys into a bloom")
    // the filter guards the FACT side: might_contain probes the fact's
    // join key (l_orderkey), not the dim's
    val mcLine = plan.linesIterator.find(_.contains("might_contain")).get
    assert(mcLine.contains("l_orderkey") && !mcLine.contains("o_orderkey"),
      s"might_contain must probe the fact join key:\n$mcLine")
  }

  test("io14 contrast: STATIC overwrite truncates untouched partitions; " +
    "dynamic replaces only the written ones — the backfill-safety gap") {
    val sq = spark; import sq.implicits._
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "part", "v")
    val patch = Seq((9L, "a", 9.0)).toDF("id", "part", "v")
    val d1 = Dml.work("io14spec_static", sf)
    Layouts.deleteDir(spark, d1)
    base.write.partitionBy("part").parquet(d1)
    patch.write.mode("overwrite").partitionBy("part").parquet(d1)
    // static (default): partition b is GONE
    assert(spark.read.parquet(d1).count() == 1)
    val d2 = Dml.work("io14spec_dynamic", sf)
    Layouts.deleteDir(spark, d2)
    base.write.partitionBy("part").parquet(d2)
    patch.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("part").parquet(d2)
    val rows = spark.read.parquet(d2)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    // partition a replaced wholesale (1 and 3 gone, 9 in); b intact
    assert(rows == Set((9L, "a"), (2L, "b")), rows.toString)
  }
}
