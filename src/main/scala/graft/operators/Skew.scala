package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives — for when AQE's runtime skew-join split is
  * not enough (e.g. one key holds 30% of a 100 TB table and even split
  * shuffle blocks overwhelm a task, or the skew is in an aggregation).
  *
  *  - [[saltedAgg]]: two-phase aggregation — partial aggregate on
  *    (key, salt) spreads a hot key over `salts` reducers, then the tiny
  *    partial result re-aggregates on key alone. Works for any algebraic
  *    aggregate (sum/count/min/max; avg = sum+count).
  *  - [[saltedJoin]]: replicate the SMALL side once per salt value and
  *    shuffle the big side on (key, salt) — each hot-key task handles
  *    1/salts of the skewed rows. Inner-join semantics preserved exactly.
  */
object Skew {

  /** Deterministic row salt in [0, salts): hashes a stable uniqueness
    * source (here: all of the row's value column) — any spread works,
    * determinism keeps tests and retries stable. */
  private def saltOf(src: Column, salts: Int): Column =
    pmod(xxhash64(src), lit(salts.toLong)).cast("int")

  /** Two-phase salted SUM/COUNT aggregation of `valueCol` by `keyCol`. */
  def saltedAgg(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salts: Int = 16): DataFrame =
    df.withColumn("_salt", saltOf(col(valueCol), salts))
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        sum(col(valueCol).cast("decimal(18,2)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("_psum")).cast("double").as("sum_value"),
        sum(col("_pcnt")).as("n"))

  /** Salted inner equi-join: `big` (skewed) against `small` on
    * bigKey == smallKey. The small side is replicated `salts` times —
    * keep it broadcast-sized per salt. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int = 16): DataFrame = {
    // The salt must come from a PER-ROW source: salting on the key would
    // put every row of the hot key into one salt bucket, defeating the
    // point. Row position is fine — each big row joins its replicated
    // small partner exactly once whatever salt it lands on.
    val spreadBig = big.withColumn("_salt",
      (monotonically_increasing_id() % salts).cast("int"))
    val explodedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    spreadBig.join(explodedSmall,
        col(bigKey) === col(smallKey) &&
          spreadBig("_salt") === explodedSmall("_salt"))
      .drop("_salt")
  }
}
