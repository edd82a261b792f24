package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** The engine's SQL function surface, defined once and installed two ways:
  *  - [[ExecutionContext]] registers it on its session's registry;
  *  - [[GraftExtensions]] injects it via `SparkSessionExtensions`, the
  *    standard Spark library integration point — users who never touch
  *    `ExecutionContext` get the functions with
  *    `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`).
  *
  * Arity (and literal int parameters) are validated in the builder so a
  * malformed call fails analysis with a real message instead of an
  * IndexOutOfBoundsException. */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** (name, implementing class, arity, DESCRIBE FUNCTION usage, builder). */
  val all: Seq[(String, Class[_], Int, String, Seq[Expression] => Expression)] =
    Seq(
      ("cosine_sim", classOf[CosineSimilarity], 2,
        "cosine_sim(a, b) - Cosine similarity of two array<float> " +
          "embeddings (double; NaN when either norm is 0).",
        (c: Seq[Expression]) => CosineSimilarity(c(0), c(1))),
      ("norm_l2", classOf[NormL2], 1,
        "norm_l2(v) - L2 norm of an array<float> embedding.",
        (c: Seq[Expression]) => NormL2(c(0))),
      ("sign_bucket", classOf[SignBucket], 2,
        "sign_bucket(vec, bits) - LSH sign bucket: an int whose bit i is " +
          "the sign of vec against deterministic random plane i.",
        (c: Seq[Expression]) => SignBucket(
          c(0), intLit(c(1), "sign_bucket(vec, bits)", "bits"))),
      ("simhash64", classOf[SimHash64], 1,
        "simhash64(tokens) - 64-bit SimHash of an array<string> token " +
          "array (majority vote over xxhash64 token bits).",
        (c: Seq[Expression]) => SimHash64(c(0))),
      ("minhash_sig", classOf[MinHashSig], 2,
        "minhash_sig(shingle_hashes, k) - k-permutation minhash " +
          "signature (array<bigint>) of pre-hashed shingles.",
        (c: Seq[Expression]) => MinHashSig(
          c(0), intLit(c(1), "minhash_sig(shingle_hashes, k)", "k"))),
      ("shingle_hashes", classOf[ShingleHashes], 2,
        "shingle_hashes(tokens, n) - DISTINCT n-gram shingle hashes " +
          "(array<bigint>, first-occurrence order) — the set form for " +
          "jaccard/minhash.",
        (c: Seq[Expression]) => ShingleHashes(
          c(0), intLit(c(1), "shingle_hashes(tokens, n)", "n"))),
      ("shingle_hashes_all", classOf[ShingleHashes], 2,
        "shingle_hashes_all(tokens, n) - EVERY n-gram window hash in " +
          "position order (multiset) — the form for frequency signals.",
        (c: Seq[Expression]) => ShingleHashes(
          c(0), intLit(c(1), "shingle_hashes_all(tokens, n)", "n"),
          distinct = false)),
      // aggregate: the analyzer wraps a registered AggregateFunction in
      // AggregateExpression itself, so the builder returns it bare
      ("topk_neighbors", classOf[TopKNeighbors], 3,
        "topk_neighbors(id, sim, k) - AGGREGATE keeping the exact top-k " +
          "(sim DESC, id ASC) per group as array<struct<neighbor_id," +
          "sim>> via a bounded k-heap with map-side partials.",
        (c: Seq[Expression]) => TopKNeighbors(
          c(0), c(1), intLit(c(2), "topk_neighbors(id, sim, k)", "k"))))

  /** One registry entry: (identifier, info, arity-checked builder). */
  def entries: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    all.map { case (name, clazz, arity, usage, build) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, null, name, usage, ""),
        (children: Seq[Expression]) => {
          if (children.length != arity)
            throw new IllegalArgumentException(
              s"Invalid number of arguments for function $name: " +
                s"expected $arity, got ${children.length}")
          build(children)
        })
    }

  /** Install on an existing session registry (the ExecutionContext path). */
  def install(registry: FunctionRegistry): Unit =
    entries.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
}

/** `SparkSessionExtensions` installer — see [[GraftFunctions]]. Also
  * injects the native as-of join's planner strategy ([[AsOfJoinStrategy]])
  * so sessions built with `spark.sql.extensions=graft.GraftExtensions`
  * plan [[AsOfJoinPlan]] without touching `experimental.extraStrategies`
  * (the builder-side fallback [[AsOfJoin.asofJoinNative]] installs), and
  * the materialized-view rewrite ([[Mv.MvRewrite]]) so extension-built
  * sessions serve registered summaries without an explicit
  * [[Mv.install]] — `Mv.register` installs on ITS session's
  * experimental batch, but a second session in the same JVM shares the
  * registry and would otherwise silently never rewrite. Double
  * installation is harmless: the rule is idempotent (a rewritten
  * aggregate scans the summary, whose roots match no registered base). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.entries.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => new AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => new AsOfJoinFilterPushdown)
    ext.injectOptimizerRule(_ => Mv.MvRewrite)
  }
}
