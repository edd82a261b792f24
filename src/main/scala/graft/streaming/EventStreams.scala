package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event analytics in
  * [[graft.EventQueries]] (the reference has no streaming surface at all —
  * SURVEY §2.12; this is driver-north-star scope). Same groupings and
  * aggregate semantics; correctness of the shared logic is oracle-checked
  * through the batch twins, and the streaming plumbing (watermarks, window
  * state, incremental emission) is asserted in StreamingSpec over a
  * MemoryStream.
  *
  * Scale: state is keyed by (window, event_type) / (session, user_id) —
  * the same shuffle keys as the batch twins, so executors hold only their
  * key range's state; watermarks bound state size by evicting windows older
  * than the lateness horizon. That is the property that lets these run
  * indefinitely on an unbounded 100 TB/day event firehose.
  */
object EventStreams {

  /** Streaming s01: tumbling 1-hour windows per event_type, tolerating
    * 2 hours of event-time lateness. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("sv"))

  /** Streaming s04: gap-based sessionization via session_window — the
    * built-in generalization of the batch lag→flag→running-sum pipeline
    * (identical 30-minute inactivity gap). */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming s02: running per-user activity rollup (update-mode state). */
  def userActivity(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
}
