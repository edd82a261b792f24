package graft.tools

import graft.QueryCatalog

/** Mechanical doc-count generator (no SparkSession needed): prints the
  * entry counts README/SURVEY quote, derived from [[QueryCatalog.all]] so
  * the documented numbers cannot drift from the code (the drift recurred
  * three rounds running when the counts were hand-maintained). Run with
  * `sbt "runMain graft.tools.Counts"` and paste the output. */
object Counts {
  def main(args: Array[String]): Unit = {
    val all = QueryCatalog.all
    val oracle = all.count(_.oracle.isDefined)
    val bench = all.count(_.bench)
    println(s"driver query entries: ${all.size}")
    println(s"oracle-checkable (DuckDB hash gate): $oracle")
    println(s"rows-only: ${all.size - oracle}")
    println(s"bench headline set: $bench")
    val byPrefix = all.groupBy(_.name.takeWhile(!_.isDigit))
      .toSeq.sortBy(_._1)
      .map { case (p, qs) => s"$p${qs.size}" }.mkString(" ")
    println(s"by family: $byPrefix")
  }
}
