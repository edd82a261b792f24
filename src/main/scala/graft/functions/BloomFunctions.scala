package graft

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column-API face of Spark's own bloom-filter expressions (the pair the
  * optimizer uses for runtime join pruning — `BloomFilterAggregate` /
  * `BloomFilterMightContain`). Spark registers them SQL-side only behind
  * the runtime-filter rewrite, so a library that wants the SAME sketch as
  * an explicit operator builds the expressions directly.
  *
  * Scale contract: the aggregate is a `TypedImperativeAggregate` — each
  * task folds its rows into a local sketch, partials OR-merge (bloom
  * union is bitwise-or, associative and commutative), and the final
  * buffer is ONE binary scalar sized by `expectedItems` — never a
  * collected value set. `mightContain` is a per-row probe of the
  * broadcast buffer: no false negatives ever, false-positive rate set by
  * the sizing, which is why a bloom PREFILTER composes with an exact
  * verify join into an exact-but-cheap two-phase plan (see
  * `p07_bloom_decontam`).
  */
object BloomFunctions {

  /** Aggregate `keys` (LongType — hash strings first, e.g. `xxhash64`)
    * into one serialized bloom filter sized for `expectedItems` distinct
    * keys at Spark's default fpp (3%). */
  def bloomAgg(keys: Column, expectedItems: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(keys), expectedItems)
        .toAggregateExpression())

  /** Per-row membership probe: true if `key` MIGHT be in `bloom` (false
    * positives possible at the sized fpp), false only if it definitely
    * is not — the one-sided guarantee prefilter plans rely on. */
  def mightContain(bloom: Column, key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom), GraftBridge.expression(key)))
}
