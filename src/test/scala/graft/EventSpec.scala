package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Edge-case tests for the batch event operators — chiefly
  * [[EventQueries.asofJoin]], whose equal-ts / no-match / latest-wins
  * semantics must mirror DuckDB's ASOF JOIN (`probe.ts >= dim.ts`,
  * inner). */
class EventSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest prior dim wins, equal ts matches, " +
    "no-prior probes drop (inner ASOF semantics)") {
    val sq = spark; import sq.implicits._
    val dim = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 12.0),
      (2L, ts("2024-01-01 11:00:00"), 21.0))
      .toDF("user_id", "ts", "dim_value")
    val probe = Seq(
      (100L, 1L, ts("2024-01-01 11:00:00")), // between dims -> 10.0
      (101L, 1L, ts("2024-01-01 12:00:00")), // equal ts -> matches 12.0
      (102L, 1L, ts("2024-01-01 13:00:00")), // after both -> 12.0
      (103L, 2L, ts("2024-01-01 10:59:59")), // before user 2's dim -> drops
      (104L, 3L, ts("2024-01-01 23:00:00"))) // no dim for user -> drops
      .toDF("event_id", "user_id", "ts")
    val out = EventQueries.asofJoin(
      probe, dim, "user_id", "ts", "m_ts", Seq("dim_value" -> "m_val"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (100L, ts("2024-01-01 10:00:00"), 10.0),
      (101L, ts("2024-01-01 12:00:00"), 12.0),
      (102L, ts("2024-01-01 12:00:00"), 12.0)))
  }

  test("asofJoin plan: one Exchange on the key — no range-join explosion, " +
    "no cartesian") {
    val sq = spark; import sq.implicits._
    val dim = Seq((1L, ts("2024-01-01 10:00:00"), 1.0))
      .toDF("user_id", "ts", "v")
    val probe = Seq((9L, 1L, ts("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts")
    val plan = EventQueries.asofJoin(
      probe, dim, "user_id", "ts", "m_ts", Seq("v" -> "m_v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "asof must stay a union+window, never a join explosion")
    val exchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected union-side exchanges only, got:\n$plan")
  }
}
