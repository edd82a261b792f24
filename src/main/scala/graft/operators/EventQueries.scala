package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the `events` table (event_id, ts, user_id,
  * event_type, value, props). These are the batch twins of the Structured
  * Streaming pipelines in [[graft.EventStreams]] — same groupings, same
  * semantics, verifiable against the DuckDB oracle (streams are not).
  *
  * Scale: hourly/typed aggregation shuffles once on (hour, type) — low
  * cardinality, partial-agg heavy, ideal shape. Sessionization shuffles
  * once on user_id for the window sort; at 100 TB that is the unavoidable
  * minimum (state per user), the same keying a streaming
  * mapGroupsWithState would use. */
object EventQueries {
  val queries: Seq[Q] = Seq(

    Q("s01_hourly_agg",
      (s, d) =>
        Tables.t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv")),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             |event_type, count(*) AS n, round(sum(value), 2) AS sv
             |FROM events GROUP BY 1, 2"""
        .stripMargin.replace('\n', ' ')),
      bench = true),

    Q("s02_user_activity",
      (s, d) =>
        Tables.t(s, d, "events")
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_types"),
            round(sum(col("value")), 2).as("total_value"),
            max(date_trunc("hour", col("ts"))).as("last_hour")),
      Some("""SELECT user_id, count(*) AS n_events,
             |count(DISTINCT event_type) AS n_types,
             |round(sum(value), 2) AS total_value,
             |CAST(max(date_trunc('hour', ts)) AS TIMESTAMP) AS last_hour
             |FROM events GROUP BY user_id"""
        .stripMargin.replace('\n', ' '))),

    Q("s03_json_extract",
      (s, d) =>
        Tables.t(s, d, "events").select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k")),
      Some("""SELECT event_id,
             |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events""".stripMargin.replace('\n', ' '))),

    // Gap-based sessionization (30-min inactivity): lag → new-session flag →
    // running sum = session id → per-user session stats.
    // Oracle note: DuckDB promotes sum(BIGINT) to HUGEINT (int128); the final
    // sum must be cast back to BIGINT or the driver's type-aware hash fails.
    Q("s04_sessionize",
      (s, d) => {
        // event_id tie-break: duplicate ts per user would otherwise let the
        // lag/running-sum split sessions differently between Spark and DuckDB.
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val newSession =
          when(col("ts").cast("long") -
            lag(col("ts"), 1).over(byUser).cast("long") > 1800, 1L)
            .otherwise(0L)
        Tables.t(s, d, "events")
          .withColumn("is_new", newSession)
          .withColumn("session_id",
            sum(col("is_new")).over(
              byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            max(col("n_events")).as("longest_session"),
            sum(col("n_events")).as("n_events"))
      },
      Some("""WITH flagged AS (
             |SELECT user_id, ts, event_id,
             |CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER
             |(PARTITION BY user_id ORDER BY ts, event_id))) > 1800
             |THEN 1 ELSE 0 END AS is_new
             |FROM events),
             |sess AS (
             |SELECT user_id,
             |sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS UNBOUNDED PRECEDING) AS session_id
             |FROM flagged),
             |per AS (SELECT user_id, session_id, count(*) AS n_events
             |FROM sess GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_sessions,
             |max(n_events) AS longest_session,
             |CAST(sum(n_events) AS BIGINT) AS n_events
             |FROM per GROUP BY user_id"""
        .stripMargin.replace('\n', ' ')),
      bench = true)
  )
}
