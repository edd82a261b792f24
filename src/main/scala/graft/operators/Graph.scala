package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the crawl's domain link graph — the seed-quality
  * signal web-scale curation ranks domains by (Common Crawl publishes
  * exactly this: a per-domain centrality from the host link graph, used
  * to prioritize fetch frontiers and weight sources).
  *
  * Scale shape: one PageRank iteration is one join (ranks ⋈ edges on
  * src — shuffle keyed by src) plus one aggregation (sum contributions
  * by dst — shuffle keyed by dst). That is THE distributed PageRank
  * plan; rounds iterate the same two shuffles, and a long-running loop
  * needs d08's lineage-cut discipline (persist + rebuild-from-RDD per
  * round) to keep the plan constant-size. Dangling mass and per-node
  * out-degree division appear in the general form as one extra
  * broadcast scalar and a `/ outdeg` on the contribution — same plan.
  */
object Graph {

  /** Two exact PageRank iterations over a FUNCTIONAL domain graph (every
    * node has out-degree 1), in integer-numerator arithmetic so the
    * result is bit-identical cross-engine: with damping 17/20 and
    * uniform start 1/n, the iterate r_t is a rational with denominator
    * n·20^t, and its numerator obeys
    *   N_1(v) = 3 + 17·indeg(v)
    *   N_2(v) = 60 + 17·Σ_{u→v} N_1(u)
    * — integer sums only; the final rank is one exact integer division
    * rendered as DOUBLE (identical IEEE rounding of identical integers).
    * Out-degree 1 is what makes the numerators integral; the general
    * graph divides contributions by outdeg(u) and moves to doubles,
    * keeping the same join/agg plan. Returns (domain, rank_num, rank).
    */
  def domainPagerank2(docs: DataFrame, n: Int = 50): DataFrame = {
    val nodes = docs.select((col("doc_id") % n).as("v")).distinct()
    // dst is a function of src's residue (out-degree stays 1, which the
    // integer numerators need) but squaring is non-injective mod n, so
    // indegrees vary 0..k and the aggregation round is non-trivial
    val edges = docs.select((col("doc_id") % n).as("src"),
      ((col("doc_id") * col("doc_id") + 1) % n).as("dst")).distinct()
    val indeg = edges.groupBy("dst").agg(count(lit(1)).as("ind"))
    val r1 = nodes.join(indeg, nodes("v") === indeg("dst"), "left")
      .select(col("v"),
        (lit(3L) + lit(17L) * coalesce(col("ind"), lit(0L))).as("n1"))
    val contrib = edges.join(r1, edges("src") === r1("v"))
      .select(col("dst").as("cv"), col("n1"))
    nodes.join(contrib, col("v") === col("cv"), "left")
      .groupBy(col("v"))
      .agg((lit(60L) + lit(17L) * coalesce(sum(col("n1")), lit(0L)))
        .as("rank_num"))
      .select(col("v").as("domain"), col("rank_num"),
        (col("rank_num").cast("double") / lit(20000.0 / 50 * n)).as("rank"))
  }
}

object GraphQueries {

  val queries: Seq[Q] = Seq(

    // DOMAIN PAGERANK under the hash gate — see [[Graph.domainPagerank2]]
    // for the exact-integer construction. The graph is CONSTRUCTED from
    // the corpus (domain doc_id%50 links to (doc_id²+1)%50 — t33's
    // constructed-gate pattern applied to edges; squaring varies the
    // indegrees), so the driver gate holds the join→aggregate iteration
    // itself to the oracle's CTE restatement: indegree round,
    // contribution round, and the final exact division all must agree
    // bit-for-bit.
    Q("g01_domain_pagerank",
      (s, d) => Graph.domainPagerank2(Tables.t(s, d, "documents")),
      Some("""WITH nodes AS (SELECT DISTINCT doc_id % 50 AS v
             |FROM documents),
             |edges AS (SELECT DISTINCT doc_id % 50 AS src,
             |(doc_id * doc_id + 1) % 50 AS dst FROM documents),
             |ind AS (SELECT dst, count(*) AS ind FROM edges GROUP BY 1),
             |r1 AS (SELECT v, 3 + 17 * COALESCE(ind, 0) AS n1
             |FROM nodes LEFT JOIN ind ON ind.dst = nodes.v),
             |c AS (SELECT e.dst AS cv, r1.n1 FROM edges e
             |JOIN r1 ON e.src = r1.v),
             |r2 AS (SELECT v,
             |CAST(60 + 17 * COALESCE(sum(n1), 0) AS BIGINT) AS rank_num
             |FROM nodes LEFT JOIN c ON c.cv = nodes.v GROUP BY v)
             |SELECT v AS domain, rank_num,
             |CAST(rank_num AS DOUBLE) / 20000.0 AS rank FROM r2"""
        .stripMargin.replace('\n', ' ')))
  )
}
