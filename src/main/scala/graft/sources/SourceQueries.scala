package graft

import org.apache.spark.sql.functions._

/** Source-format round trips under the driver's hash gate: the CSV and
  * JSON-lines registration paths ([[ExecutionContext.registerCsv]] /
  * [[ExecutionContext.registerJson]]) carry real data through
  * write → register-with-explicit-schema → catalog read, and the result
  * must hash-match the parquet original in DuckDB. Parquet remains the
  * analytics format (columnar, predicate pushdown, column pruning —
  * every other entry reads it); CSV/JSON are the INTERCHANGE formats an
  * ingest edge speaks, and these entries prove that edge loses nothing.
  *
  * Scale notes: both entries register with the EXPLICIT schema — schema
  * inference costs one extra full scan before the first query can plan
  * (the registerCsv scaladoc contract). Writes stay partitioned (no
  * coalesce): a 100 TB ingest drop is many files; the register path
  * reads whatever file count the writer produced. Row formats carry no
  * pushdown/pruning, which is exactly why these are edges, not the
  * analytics store.
  */
object SourceQueries {

  val queries: Seq[Q] = Seq(

    // CSV round trip: dimension written with a header, re-registered
    // with the parquet schema, read back through the catalog. Quoting/
    // escaping is the writer↔reader contract under test — the oracle
    // only matches if every value survived the text round trip.
    Q("io01_csv_source",
      (s, d) => {
        val dir = Dml.work("io01", d) + "/nation_csv"
        val base = Tables.t(s, d, "nation")
        base.write.mode("overwrite").option("header", "true").csv(dir)
        new ExecutionContext(s)
          .registerCsv("g_csv_nation", dir, base.schema)
          .table("g_csv_nation")
      },
      Some("SELECT * FROM nation")),

    // JSON-lines round trip: same contract through the JSON edge.
    Q("io02_json_source",
      (s, d) => {
        val dir = Dml.work("io02", d) + "/region_json"
        val base = Tables.t(s, d, "region")
        base.write.mode("overwrite").json(dir)
        new ExecutionContext(s)
          .registerJson("g_json_region", dir, base.schema)
          .table("g_json_region")
      },
      Some("SELECT * FROM region"))
  )
}
