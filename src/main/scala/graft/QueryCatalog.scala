package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark-side builder and (when SQL-expressible) an
  * equivalent DuckDB oracle statement over the same parquet tables. The
  * driver hash-compares both sides with columns sorted by name, so builders
  * and oracles must agree on output column NAMES exactly.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Included in the per-round Bench headline set. */
    bench: Boolean = false,
    /** PLANS.md dump override for entries whose `build` hides the
      * interesting plan (an eager checkpoint erases lineage; an adaptive
      * plan only finalizes on execution). Returns the exact plan text the
      * dump should carry instead of `build`'s pre-execution explain. */
    explainOverride: Option[(SparkSession, String) => String] = None)

/** Aggregates every query family into the driver-facing registry. */
object QueryCatalog {
  lazy val all: Seq[Q] =
    RelationalQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      EventQueries.queries ++
      DmlQueries.queries ++
      MultimodalQueries.queries ++
      SkewQueries.queries ++
      SamplingQueries.queries ++
      SourceQueries.queries ++
      GraphQueries.queries ++
      CboQueries.queries ++
      MvQueries.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
