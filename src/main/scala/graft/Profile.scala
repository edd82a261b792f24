package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic main: per-query breakdown of build (DataFrame construction +
  * analysis) vs first execution vs warm re-execution, plus the formatted
  * physical plan for the queries named in args (or the bench set).
  * Usage: runMain graft.Profile [sfDir] [queryName...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else QueryCatalog.all.filter(_.bench).map(_.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensureRegistered(spark, sfDir)

    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000

    if (names.contains("_layouts")) {
      // Drive the bucketed-layout co-located join end-to-end and show the
      // plan a user of Layouts.writeBucketed would get.
      import org.apache.spark.sql.functions._
      Layouts.writeBucketed(
        Tables.t(spark, sfDir, "orders"), "demo_orders", "o_orderkey", 8)
      Layouts.writeBucketed(
        Tables.t(spark, sfDir, "lineitem"), "demo_lineitem", "l_orderkey", 8)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("demo_orders")
        .join(spark.table("demo_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "o_totalprice", "l_quantity")
      println("LAYOUTS rows=" + j.count())
      println("LAYOUTS exchange_free=" +
        !j.queryExecution.executedPlan.toString.contains("Exchange"))
      spark.sql("DROP TABLE IF EXISTS demo_orders")
      spark.sql("DROP TABLE IF EXISTS demo_lineitem")
      // salted two-phase aggregation over the skewed-by-construction
      // lineitem quantity (orderkey space is fine; demo uses returnflag
      // which has 3 hot values — worst-case skew shape)
      val salted = Skew.saltedAgg(
        Tables.t(spark, sfDir, "lineitem"), "l_returnflag", "l_quantity",
        salts = 16)
      println("LAYOUTS salted_agg_rows=" + salted.count())
      // partitioned write + pruned read
      val p = Dml.work("profile_layout", sfDir) + "/orders_by_year"
      Layouts.writePartitioned(
        Tables.t(spark, sfDir, "orders")
          .withColumn("y", year(col("o_orderdate"))), p, "y")
      val pruned = spark.read.parquet(p).filter(col("y") === 1997)
      println("LAYOUTS pruned_rows=" + pruned.count() + " partition_filtered=" +
        pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
      spark.stop(); return
    }

    if (names.contains("_d03stages")) {
      val docs = Tables.t(spark, sfDir, "documents")
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"STAGE $label%-12s ${ms(t0)}%6dms rows=$n")
      }
      val prep = Dedup.minhashPrep(docs, 3, 16)
      time("prep")(prep.count())
      time("prep2")(prep.count())
      import org.apache.spark.sql.functions._
      val banded = prep
        .select(col("doc_id"),
          explode(TextFunctions.lshBands(col("sig"), 4, 4)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
      time("banded")(banded.count())
      val overCap = banded.groupBy("band", "bh").count()
        .filter(col("count") > 1000).select("band", "bh")
      val capped = banded.join(broadcast(overCap), Seq("band", "bh"), "left_anti")
      val cands = capped.alias("l").join(capped.alias("r"),
          col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
      time("cands")(cands.count())
      time("full")(Dedup.minhashNearDupPairs(docs, 3, 16, 4, 0.5).count())
      time("full2")(Dedup.minhashNearDupPairs(docs, 3, 16, 4, 0.5).count())
      spark.stop(); return
    }

    names.foreach { name =>
      val qq = QueryCatalog.byName(name)
      val t0 = System.nanoTime()
      val df = qq.build(spark, sfDir)
      df.queryExecution.analyzed // force analysis
      val buildMs = ms(t0)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val coldMs = ms(t1)
      val t2 = System.nanoTime()
      qq.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      val warmMs = ms(t2)
      println(f"PROFILE $name%-28s build=${buildMs}%5dms cold=${coldMs}%6dms warm=${warmMs}%6dms")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println(qq.build(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
