package graft.tools

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway experiment harness for the optimization round — NOT part of
  * the driver contract; variants here never replace a declared query
  * without oracle re-verification. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosAsLongConf._1, Tables.nanosAsLongConf._2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.ensureRegistered(spark, sfDir)

    def time3(label: String)(mk: => DataFrame): Unit = {
      spark.sharedState.cacheManager.clearCache()
      ManagedCache.releaseAll()
      System.gc(); Thread.sleep(200)
      mk.write.format("noop").mode("overwrite").save() // warm
      val ts = Seq.fill(3) {
        System.gc()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"SCRATCH $label%-28s med=${ts(1)}%.3f min=${ts(0)}%.3f max=${ts(2)}%.3f")
    }

    def t(n: String) = Tables.t(spark, sfDir, n)
    def docs = t("documents")

    def g13Old = QueryCatalog.byName("g13_label_propagation").build(spark, sfDir)

    // single-scan edge construction + eagerly-localized tiny graph
    def g13New: DataFrame = {
      val a = (col("doc_id") % 30).as("a")
      val raw = docs.select(a, explode(array(
        (col("doc_id") % 30) * (col("doc_id") % 30) + 1,
        col("doc_id") + 2,
        col("doc_id") * 3 + 5)).as("b0"))
        .select(col("a"), (col("b0") % 30).as("b"))
      val edges = raw.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("lo"),
          greatest(col("a"), col("b")).as("hi"))
        .distinct()
      val nodes = docs.select((col("doc_id") % 30).as("v")).distinct()
      Graph.labelPropagation(nodes, edges)
    }

    def sortedRows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    println("G13 EQUAL: " + (sortedRows(g13Old) == sortedRows(g13New)))
    for (round <- 1 to 2) {
      time3(s"g13_old_$round")(g13Old)
      time3(s"g13_new_$round")(g13New)
    }
    spark.stop()
  }
}
