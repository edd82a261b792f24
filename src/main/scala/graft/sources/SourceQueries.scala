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
      Some("SELECT * FROM region")),

    // HIVE-PARTITIONED layout under the hash gate: the firehose writes
    // partitioned by event_type, and the filtered read must (a) prune to
    // the one matching directory at PLANNING time — SkewLayoutSpec
    // asserts the scan's PartitionFilters — and (b) return exactly the
    // rows a predicate on the unpartitioned original returns. This is
    // the 100 TB date/category-partition pattern: the filter never
    // touches the other partitions' files at all. Aggregate sums stay
    // exact decimal (cteDerived rule).
    Q("io03_partitioned_source",
      (s, d) => {
        val dir = Dml.work("io03", d) + "/events_part"
        val ev = Tables.t(s, d, "events").select(
          col("event_id"), col("user_id"), col("value"), col("event_type"))
        Layouts.writePartitioned(ev, dir, "event_type")
        s.read.parquet(dir).filter(col("event_type") === "click")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      },
      Some("""SELECT user_id, count(*) AS n,
             |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
             |FROM events WHERE event_type = 'click' GROUP BY 1"""
        .stripMargin.replace('\n', ' '))),

    // SCHEMA EVOLUTION under the hash gate — the 100 TB reality that a
    // long-lived dataset's files were written under DIFFERENT schema
    // versions: a v1 drop without a column, a v2 drop with it.
    // `mergeSchema` unifies the footers at read time (v1 rows surface
    // the added column as typed NULL), which is the contract that lets
    // an ingest evolve without rewriting history. The oracle restates
    // the union with an explicit NULL cast. Scale note: mergeSchema
    // costs a footer read per file at planning — pin the merged schema
    // explicitly once it stabilizes (same argument as registerCsv's
    // explicit-schema contract).
    Q("io04_schema_evolution",
      (s, d) => {
        val dir = Dml.work("io04", d) + "/nation_evolved"
        val base = Tables.t(s, d, "nation")
        base.select("n_nationkey", "n_name")
          .write.mode("overwrite").parquet(s"$dir/v=1")
        base.select("n_nationkey", "n_name", "n_regionkey")
          .write.mode("overwrite").parquet(s"$dir/v=2")
        s.read.option("mergeSchema", "true").parquet(dir)
          .select("n_nationkey", "n_name", "n_regionkey", "v")
      },
      Some("""SELECT n_nationkey, n_name,
             |CAST(NULL AS INTEGER) AS n_regionkey, 1 AS v FROM nation
             |UNION ALL
             |SELECT n_nationkey, n_name, n_regionkey, 2 AS v
             |FROM nation""".stripMargin.replace('\n', ' '))),

    // BUCKETED CO-LOCATED JOIN under the hash gate: both fact tables
    // written bucketed on the join key (the shuffle paid ONCE at write
    // time), then the orders ⋈ lineitem aggregate reads them back
    // through the bucketed catalog tables. The zero-Exchange plan
    // property is asserted in BucketingSpec (with broadcast disabled so
    // the claim is live); THIS entry puts the bucketed read path's
    // RESULT under the driver's oracle so "exchange-free" is also
    // provably "correct". Exact decimal fold per the dsum rule.
    Q("io05_bucketed_join",
      (s, d) => {
        Layouts.writeBucketed(
          Tables.t(s, d, "orders"), "g_b_orders", "o_orderkey", 8)
        Layouts.writeBucketed(
          Tables.t(s, d, "lineitem"), "g_b_lineitem", "l_orderkey", 8)
        s.table("g_b_orders")
          .join(s.table("g_b_lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("qty"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY 1""".stripMargin.replace('\n', ' '))),

    // SHARDED TRAINING-DATA DELIVERY under the hash gate: the terminal
    // sink of a curation pipeline is "write the corpus as N deterministic
    // shards + a manifest the trainer trusts". Shard assignment is
    // CONTENT-KEYED (first md5 hex nibble, 's'-prefixed so partition
    // discovery can never type-flirt with integers) — reproducible on any
    // partitioning/layout, no RNG, no round-robin coupling to the input
    // split count (t10's determinism rule applied to the physical
    // layout). The entry writes the real hive-partitioned layout, READS
    // IT BACK, and emits the per-shard manifest (docs, chars, whitespace
    // tokens, id range); the oracle restates the manifest straight from
    // the logical table, so the gate proves write→layout→read loses
    // nothing and balances exactly as the hash dictates. Scale: the
    // write shuffles once on the shard key (16 here; 2-nibble = 256 for
    // a real corpus), the manifest is a partial-agg'd scan of the files
    // just written; trainer-side, any shard subset is a clean sample —
    // the md5 key makes shards iid slices, the property loaders rely on.
    Q("io06_shard_manifest",
      (s, d) => {
        val dir = Dml.work("io06", d) + "/docs_sharded"
        Tables.t(s, d, "documents")
          .withColumn("shard",
            concat(lit("s"), substring(md5(col("text")), 1, 1)))
          .write.mode("overwrite").partitionBy("shard").parquet(dir)
        s.read.parquet(dir)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("n_chars"),
            sum(size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
              .as("n_tokens"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
      },
      Some("""SELECT 's' || substr(md5(text), 1, 1) AS shard,
             |count(*) AS n_docs,
             |CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
             |AS BIGINT) AS n_tokens,
             |min(doc_id) AS min_doc, max(doc_id) AS max_doc
             |FROM documents GROUP BY 1"""
        .stripMargin.replace('\n', ' '))),

    // Z-ORDER CLUSTERING KEY under the hash gate: the Morton interleave
    // of (customer, order-day) that [[Layouts.zOrderValue]] computes —
    // sorting a fact table by this value makes per-file min/max stats
    // selective on BOTH dimensions at once (the Delta/Iceberg
    // OPTIMIZE ZORDER trick; single-key sorts leave the second column
    // at full width in every file, so a date-only filter reads
    // everything). The Spark side folds the 16 bit positions in one
    // per-row HOF expression; the oracle recomputes the interleave by
    // explode+sum — two formulations of the same exact integer
    // arithmetic, so the gate proves the layout key bit-for-bit. The
    // file-skipping property the key buys is asserted physically in
    // SkewLayoutSpec (narrow second-dimension filter touches fewer
    // files than an x-sorted layout of the same data).
    Q("io07_zorder_index",
      (s, d) => {
        val x = col("o_custkey") % 65536
        val y = datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long") % 65536
        Tables.t(s, d, "orders")
          .select(col("o_orderkey"),
            Layouts.zOrderValue(x, y).as("zval"))
      },
      Some("""WITH b AS (SELECT o_orderkey,
             |o_custkey % 65536 AS x,
             |date_diff('day', DATE '1970-01-01',
             |CAST(o_orderdate AS DATE)) % 65536 AS y FROM orders)
             |SELECT o_orderkey,
             |CAST(sum((((x >> j) & 1) << (2 * j)) +
             |(((y >> j) & 1) << (2 * j + 1))) AS BIGINT) AS zval
             |FROM b CROSS JOIN (SELECT unnest(range(0, 16)) AS j) bits
             |GROUP BY 1"""
        .stripMargin.replace('\n', ' '))),

    // SMALL-FILE COMPACTION under the hash gate: fragment the corpus
    // into 64 tiny files (the streaming-sink failure mode), rewrite it
    // through [[Layouts.compactFiles]]' shuffle-free coalesce
    // bin-packing, READ THE COMPACTED LAYOUT BACK, and emit a per-source
    // content summary (docs, chars, distinct content hashes, id sum) the
    // oracle restates from the logical table — so the gate proves the
    // maintenance rewrite loses and duplicates NOTHING. The physical
    // claim (file count actually collapses to the bin-packed target) is
    // asserted in SkewLayoutSpec, where file counts are observable.
    Q("io08_compaction",
      (s, d) => {
        val base = Dml.work("io08", d)
        val frag = base + "/frag"
        val comp = base + "/compact"
        Tables.t(s, d, "documents").repartition(64)
          .write.mode("overwrite").parquet(frag)
        Layouts.compactFiles(s, frag, comp)
        s.read.parquet(comp)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("n_chars"),
            countDistinct(md5(col("text"))).as("n_distinct"),
            sum(col("doc_id")).as("id_sum"))
      },
      Some("""SELECT source, count(*) AS n_docs,
             |CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
             |CAST(sum(doc_id) AS BIGINT) AS id_sum
             |FROM documents GROUP BY source"""
        .stripMargin.replace('\n', ' '))),

    // INCREMENTAL INGESTION under the hash gate: drop 1 (even doc_ids)
    // lands and is checkpointed into the manifest; drop 2 (odd doc_ids)
    // lands afterwards; [[Layouts.incrementalScan]] must surface EXACTLY
    // the second drop — the oracle restates the odd-id half from the
    // logical table, so over-reading (reprocessing drop 1) or
    // under-reading (missing new files) both flip the gate red. State is
    // deleted up front (io05's hermeticity rule for cross-JVM work
    // dirs). BucketingSpec drives the lifecycle: bootstrap reads all,
    // post-checkpoint reads nothing, next drop reads only itself.
    Q("io09_incremental_scan",
      (s, d) => {
        val base = Dml.work("io09", d)
        val land = base + "/landing"
        val mf = base + "/manifest"
        Layouts.deleteDir(s, land)
        Layouts.deleteDir(s, mf)
        val docs = Tables.t(s, d, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("append").parquet(land)
        Layouts.markProcessed(s, mf, Layouts.snapshotListing(s, land))
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(land)
        Layouts.incrementalScan(s, land, mf,
            Layouts.snapshotListing(s, land))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("n_chars"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
      },
      Some("""SELECT source, count(*) AS n_docs,
             |CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |min(doc_id) AS min_doc, max(doc_id) AS max_doc
             |FROM documents WHERE doc_id % 2 = 1 GROUP BY source"""
        .stripMargin.replace('\n', ' '))),

    // p16: INCREMENTAL CURATION ACROSS TWO INGEST CYCLES — the
    // composed steady-state every production pipeline actually runs
    // (io09's manifest delta + d01's content dedup + d10's
    // stored-index discipline, under ONE oracle): cycle 1 lands the
    // even-third drop, admits it against an empty index, PERSISTS the
    // content-hash index, and checkpoints the manifest; cycle 2 lands
    // fresh docs PLUS byte-identical re-drops of cycle-1 content under
    // new doc_ids (the at-least-once transport reality). The gate
    // holds that cycle 2 (a) reads ONLY the new files (manifest
    // delta), (b) collapses within-cycle duplicates to the min
    // doc_id, and (c) rejects everything already in the STORED index
    // without rescanning cycle-1 data — per-source seen/admitted/dup
    // counts. Scale: the index lookup is one anti-join against a
    // persisted hash table that grows by admissions only; no cycle
    // ever re-reads prior cycles' corpus.
    Q("p16_incremental_curation",
      (s, d) => {
        val base = Dml.work("p16", d)
        val land = base + "/landing"
        val mf = base + "/manifest"
        val idxDir = base + "/dedup_index"
        Seq(land, mf, idxDir).foreach(Layouts.deleteDir(s, _))
        val docs = Tables.t(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"))
        // cycle 1: even-third drop -> admit all distinct, store index
        docs.filter(col("doc_id") % 3 === 0)
          .write.mode("append").parquet(land)
        val l1 = Layouts.snapshotListing(s, land)
        Layouts.incrementalScan(s, land, mf, l1)
          .select(md5(col("text")).as("h")).distinct()
          .write.mode("overwrite").parquet(idxDir)
        Layouts.markProcessed(s, mf, l1)
        // cycle 2: fresh docs + re-dropped cycle-1 content, new ids
        docs.filter(col("doc_id") % 3 === 1)
          .write.mode("append").parquet(land)
        docs.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            col("text"), col("source"))
          .write.mode("append").parquet(land)
        val l2 = Layouts.snapshotListing(s, land)
        val d2 = Layouts.incrementalScan(s, land, mf, l2)
        Layouts.markProcessed(s, mf, l2)
        val wIn = org.apache.spark.sql.expressions.Window
          .partitionBy("h").orderBy("doc_id")
        val admitted = d2
          .withColumn("h", md5(col("text")))
          .withColumn("rn", row_number().over(wIn))
          .filter(col("rn") === 1)
          .join(s.read.parquet(idxDir), Seq("h"), "left_anti")
        d2.groupBy("source").agg(count(lit(1)).as("n_seen"))
          .join(admitted.groupBy("source")
            .agg(count(lit(1)).as("n_admitted")), Seq("source"), "left")
          .select(col("source"), col("n_seen"),
            coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
            (col("n_seen") - coalesce(col("n_admitted"), lit(0L)))
              .as("n_dup"))
      },
      Some("""WITH idx AS (SELECT DISTINCT md5(text) AS h
             |FROM documents WHERE doc_id % 3 = 0),
             |c2 AS (SELECT doc_id, text, source FROM documents
             |WHERE doc_id % 3 = 1
             |UNION ALL SELECT doc_id + 1000000 AS doc_id, text, source
             |FROM documents WHERE doc_id % 3 = 0),
             |wd AS (SELECT doc_id, source, md5(text) AS h,
             |row_number() OVER (PARTITION BY md5(text)
             |ORDER BY doc_id) AS rn FROM c2),
             |adm AS (SELECT wd.source FROM wd LEFT JOIN idx
             |ON idx.h = wd.h WHERE rn = 1 AND idx.h IS NULL),
             |seen AS (SELECT source, count(*) AS n_seen FROM c2
             |GROUP BY source),
             |a AS (SELECT source, count(*) AS n_admitted FROM adm
             |GROUP BY source)
             |SELECT seen.source, n_seen,
             |COALESCE(n_admitted, 0) AS n_admitted,
             |n_seen - COALESCE(n_admitted, 0) AS n_dup
             |FROM seen LEFT JOIN a USING (source)"""
        .stripMargin.replace('\n', ' '))),

    // MALFORMED-RECORD ACCOUNTING under the hash gate — the ingest
    // contract every raw-text feed needs: a CSV drop where every tenth
    // record is garbage is read in PERMISSIVE mode with an explicit
    // schema and a corrupt-record column, and the entry reports the
    // per-source stats of the rows that PARSED plus the quarantine
    // count — the oracle restates both halves from the logical table,
    // so silently dropping corrupt rows (FAILFAST's opposite failure)
    // or mis-parsing good ones both flip the gate. Scale: PERMISSIVE
    // parse is per-row scan work; the quarantine column routes to a
    // dead-letter sink in production, same plan.
    Q("io10_corrupt_records",
      (s, d) => {
        val dir = Dml.work("io10", d) + "/feed_csv"
        val docs = Tables.t(s, d, "documents")
        // to_csv quotes/escapes properly — a bare concat_ws would let a
        // comma inside `source` shift fields and mis-parse a good row
        docs.select(
            when(col("doc_id") % 10 === 0,
              concat(lit("corrupt#"), col("doc_id")))
              .otherwise(to_csv(struct(col("doc_id"), col("source"),
                col("n_chars")))).as("value"))
          .write.mode("overwrite").text(dir)
        val schema = "id long, src string, chars long, _corrupt string"
        val parsed = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(dir)
        // Spark refuses plans whose only referenced column is the
        // corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN
        // requires caching first); a parse failure always nulls the
        // typed `id`, so quarantine routing keys on that — same rows,
        // no materialization requirement.
        parsed.filter(col("id").isNotNull)
          .groupBy("src")
          .agg(count(lit(1)).as("n"),
            sum(col("chars")).as("chars_sum"))
          .unionByName(parsed.filter(col("id").isNull)
            .agg(count(lit(1)).as("n"))
            .select(lit("_corrupt").as("src"), col("n"),
              lit(0L).as("chars_sum")))
      },
      Some("""SELECT source AS src, count(*) AS n,
             |CAST(sum(n_chars) AS BIGINT) AS chars_sum
             |FROM documents WHERE doc_id % 10 != 0 GROUP BY source
             |UNION ALL SELECT '_corrupt', count(*), 0 FROM documents
             |WHERE doc_id % 10 = 0"""
        .stripMargin.replace('\n', ' '))),

    // IN-FLIGHT OBSERVED METRICS under the hash gate — Dataset.observe
    // piggybacks aggregate metrics on a pass the job already makes
    // (CollectMetrics accumulates per task, merges on the driver): the
    // free data-quality counters every 100 TB ingest wants (row count,
    // quantity total, discount-rate tally) WITHOUT a second scan — at
    // scale a separate metrics query would double the IO bill. The
    // builder runs ONE real action (the downstream flag rollup) and
    // returns the metrics the SAME pass observed; the oracle recomputes
    // them as plain aggregates, so the gate proves the in-flight path
    // equals the ground truth. Decimal-exact quantity sum (q28's money
    // rule), one double cast at readout.
    Q("io11_observed_metrics",
      (s, d) => {
        val obs = new org.apache.spark.sql.Observation()
        val li = Tables.t(s, d, "lineitem").observe(obs,
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
          count(when(col("l_discount") > 0.05, 1)).as("n_discounted"))
        // the job the pipeline runs anyway; metrics ride its scan
        li.groupBy("l_returnflag").agg(count(lit(1))).collect()
        val m = obs.get
        val sq = s
        import sq.implicits._
        Seq((m("n_rows").asInstanceOf[Long],
          m("sq").asInstanceOf[java.math.BigDecimal].doubleValue(),
          m("n_discounted").asInstanceOf[Long]))
          .toDF("n_rows", "sum_qty", "n_discounted")
      },
      Some("""SELECT count(*) AS n_rows,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |AS sum_qty,
             |count(CASE WHEN l_discount > 0.05 THEN 1 END)
             |AS n_discounted FROM lineitem"""
        .stripMargin.replace('\n', ' '))),

    // io12: the `binaryFile` SOURCE — the ingest edge a multimodal
    // corpus actually arrives through (one opaque file per image/audio
    // asset; the mm-family's binary COLUMNS assume something already
    // landed them in a table, and this is that something). Harness:
    // constructed PNG assets (mm02's doc_id-derived construction, one
    // 29-byte file per doc_id%3==0 document) are written EXECUTOR-SIDE
    // via foreachPartition — each task writes its own files, the shape
    // a distributed asset-writer has at 100 TB (no driver fan-in) —
    // then read back with binaryFile + pathGlobFilter and parsed by the
    // REAL magic-dispatched decodeHeader. The gate proves the whole
    // edge: file naming (doc_id round-trips through the path), sizing
    // (binaryFile's `length` equals the constructed 29 bytes), and
    // content (parsed dims equal the construction arithmetic). Scale:
    // binaryFile pushes pathGlobFilter and length predicates to the
    // LISTING, and each asset is one splittable-unit row — the
    // 100 TB caveat (small-file listing pressure) is exactly what
    // io06's shard manifest + io08's compaction exist for.
    Q("io12_binaryfile_source",
      (s, d) => {
        val dir = Dml.work("io12_assets", d)
        Layouts.deleteDir(s, dir)
        new java.io.File(dir).mkdirs()
        val w = (col("doc_id") % 300 + 10).cast("int")
        val h = ((col("doc_id") * 5) % 200 + 10).cast("int")
        val ct = when(col("doc_id") % 2 === 0, lit("00"))
          .otherwise(lit("06"))
        Tables.t(s, d, "documents").filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), unhex(Multimodal.pngHex(w, h, ct))
            .as("png"))
          .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
            rows.foreach { r =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(dir, s"doc_${r.getLong(0)}.png"),
                r.getAs[Array[Byte]](1))
            }
          }
        val meta = Multimodal.decodeHeader(col("content"))
        s.read.format("binaryFile").option("pathGlobFilter", "*.png")
          .load(dir)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.png$", 1)
              .cast("long").as("doc_id"),
            col("length").as("n_bytes"),
            meta.getField("width").as("width"),
            meta.getField("height").as("height"),
            meta.getField("channels").as("channels"))
      },
      Some("""SELECT doc_id, CAST(29 AS BIGINT) AS n_bytes,
             |CAST(doc_id % 300 + 10 AS INTEGER) AS width,
             |CAST((doc_id * 5) % 200 + 10 AS INTEGER) AS height,
             |CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 4 END AS INTEGER)
             |AS channels
             |FROM documents WHERE doc_id % 3 = 0"""
        .stripMargin.replace('\n', ' '))),

    // io13: ORC round trip — the OTHER columnar format a lakehouse
    // speaks (Hive-ecosystem tables arrive as ORC; Spark's reader is
    // native and vectorized, with the same predicate-pushdown and
    // column-pruning machinery as parquet, so ORC inputs are
    // analytics-grade, not just interchange). The gate carries the
    // type-diverse `orders` table (bigint keys, double money, string
    // enums, timestamp_ntz dates) through write-ORC → read-ORC and
    // must hash-match the parquet original — timestamp_ntz is the
    // sharp edge (ORC's writer must not shift it through a zone) and
    // is exactly why this gate exists. The filtered read's pushdown
    // is asserted plan-side in the spec, mirroring io03's contract.
    Q("io13_orc_source",
      (s, d) => {
        val dir = Dml.work("io13", d) + "/orders_orc"
        Tables.t(s, d, "orders").write.mode("overwrite").orc(dir)
        s.read.orc(dir)
      },
      Some("SELECT * FROM orders")),

    // io14: DYNAMIC partition overwrite — the BACKFILL write semantic:
    // re-running one day/category's pipeline must replace ONLY the
    // partitions the new data touches, not truncate the table (static
    // overwrite mode — Spark's default — wipes every partition first;
    // at 100 TB that difference is a catastrophic data-loss footgun,
    // which is why this is a gated semantic, not a config footnote).
    // Harness: write events partitioned by type, then overwrite JUST
    // the 'click' partition with value-doubled rows under
    // partitionOverwriteMode=dynamic; the gated read-back must show
    // doubled clicks AND untouched other partitions — the oracle
    // states exactly that CASE split. Scale: the rewrite IO is
    // proportional to the touched partition, never the table.
    Q("io14_dynamic_overwrite",
      (s, d) => {
        val dir = Dml.work("io14", d) + "/events_by_type"
        val ev = Tables.t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            col("event_type"))
        ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
        ev.filter(col("event_type") === "click")
          .withColumn("value", col("value") * 2)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("event_type").parquet(dir)
        s.read.parquet(dir)
      },
      Some("""SELECT event_id, user_id,
             |CASE WHEN event_type = 'click' THEN value * 2
             |ELSE value END AS value, event_type FROM events"""
        .stripMargin.replace('\n', ' '))),

    // io15: ZSTD parquet round trip — the compression codec a 100 TB
    // lake actually runs (snappy is Spark's default for historical
    // speed reasons; zstd cuts storage ~30-40% at comparable scan
    // cost, and at petabyte scale the storage bill IS the argument).
    // The gate carries lineitem — the widest, most numeric table —
    // through write-zstd → read and must hash-match the original;
    // codec choice must be a pure layout concern with zero value
    // drift, which is exactly what a bit-hash proves. The codec
    // actually being zstd is asserted on the file names in-entry (a
    // misspelled option silently falls back to snappy — that silence
    // is the trap worth guarding).
    Q("io15_zstd_roundtrip",
      (s, d) => {
        val dir = Dml.work("io15", d) + "/lineitem_zstd"
        Tables.t(s, d, "lineitem").write.mode("overwrite")
          .option("compression", "zstd").parquet(dir)
        val files = new java.io.File(dir).listFiles()
          .map(_.getName).filter(_.endsWith(".parquet"))
        require(files.nonEmpty && files.forall(_.contains(".zstd.")),
          s"expected zstd-compressed parts, got ${files.toSeq}")
        s.read.parquet(dir)
      },
      Some("SELECT * FROM lineitem")),

    // io16: XML round trip through Spark 4's NATIVE xml source (the
    // spark-xml donation, SPARK-44265) — the remaining interchange
    // format real lakes still ingest (feeds, sitemaps, legacy B2B
    // drops). Same contract as io01/io02/io13: write a table out
    // through the format's edge, read it back WITH an explicit schema
    // (inference is a second full scan at 100 TB — never pay it on a
    // known feed), and the gate hash-matches the original — XML
    // escaping, element ordering, and type restoration must be
    // value-lossless. rowTag is the per-record element; the read is
    // splittable per file like the other text-edge sources.
    Q("io16_xml_source",
      (s, d) => {
        val dir = Dml.work("io16", d) + "/nation_xml"
        val base = Tables.t(s, d, "nation")
        base.write.mode("overwrite").option("rowTag", "nation")
          .format("xml").save(dir)
        s.read.format("xml").option("rowTag", "nation")
          .schema(base.schema).load(dir)
      },
      Some("SELECT * FROM nation")),

    // io17: DYNAMIC PARTITION PRUNING — the runtime complement of io03's
    // static pruning and the single biggest scan-saver on a partitioned
    // 100 TB fact: when the partition-key predicate lives on the DIM side
    // of a join (the star-schema norm — "sum sales for the priorities in
    // this lookup"), no static filter reaches the fact scan, and without
    // DPP the whole table is read. Spark plans a dynamicpruning#
    // subquery on the fact's PartitionFilters, reuses the dim's
    // broadcast, and skips non-matching partitions at RUNTIME. Harness:
    // orders hive-partitioned by o_orderpriority; the dim is a parquet
    // LOOKUP TABLE (priority → tier) filtered on tier — an INDEPENDENT
    // attribute. That independence is the whole point: any predicate
    // expressible as a function of the join key transfers to the fact
    // STATICALLY via constraint inference (two earlier cuts of this
    // entry proved it — both `o_orderpriority < '3'` and
    // `cast(substring(o_orderpriority,1,1) as int) <= 2` appeared as
    // static PartitionFilters), demonstrating nothing about DPP. A tier
    // column only the lookup carries cannot be inferred across the
    // join, so the runtime dynamicpruning filter is the ONLY partition
    // pruning in the plan — the spec asserts it is present, is alone,
    // and that the scan metric read 2 of 5 partitions.
    Q("io17_dynamic_partition_pruning",
      (s, d) => {
        val (dir, lookDir) = ensureDppFixture(s, d)
        val fact = s.read.parquet(dir)
        val dim = s.read.parquet(lookDir).filter(col("tier") === "fast")
        fact.join(broadcast(dim), Seq("o_orderpriority"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("total"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |AS total FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |GROUP BY 1""".stripMargin.replace('\n', ' ')),
      bench = true),

    // FILE-LEVEL MIN/MAX DATA SKIPPING ([[Layouts.writeWithStats]] /
    // [[Layouts.skippingScan]]): planning-time FILE-LIST pruning from a
    // per-file stats manifest on a NON-partition column — the
    // Delta/Iceberg data-skipping mechanism, distinct from partition
    // pruning (io03/io17) and parquet row-group skipping (io07). The
    // gate holds the pruned read to the plain relational range query;
    // the files-read < files-total evidence is SkewLayoutSpec's (file
    // counts are layout-dependent, not oracle territory). The key range
    // sits in replica 0's key space, so octave runs skip even harder.
    Q("io18_stats_skipping",
      (s, d) => {
        val dir = Dml.work("io18", d)
        Layouts.writeWithStats(
          s, Tables.t(s, d, "lineitem"), dir, "l_orderkey", 16)
        val (df, _, _) =
          Layouts.skippingScan(s, dir, "l_orderkey", 100L, 2000L)
        df.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("qty"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |AS qty FROM lineitem
             |WHERE l_orderkey >= 100 AND l_orderkey <= 2000
             |GROUP BY 1""".stripMargin.replace('\n', ' '))),

    // Z-ORDERED MULTI-COLUMN SKIPPING ([[Layouts.writeZOrdered]] /
    // [[Layouts.skippingScanOn]]): ONE space-filling-curve layout whose
    // per-file stats prune on EITHER clustered column — here the gate
    // reads through a predicate on the SECOND column (l_partkey), the
    // one a single-key sort leaves unprunable (every first-key-sorted
    // file spans the full partkey range). The hash gate holds the
    // pruned read to the plain relational range query; the
    // files-read < files-total evidence on BOTH columns is
    // SkewLayoutSpec's. Range in replica 0's key space (octave runs
    // skip harder, like io18).
    Q("io19_zorder_skipping",
      (s, d) => {
        val dir = ensureZOrderFixture(s, d)
        val (df, _, _) =
          Layouts.skippingScanOn(s, dir, "l_partkey", 50d, 400d)
        df.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("revenue"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |AS revenue FROM lineitem
             |WHERE l_partkey >= 50 AND l_partkey <= 400
             |GROUP BY 1""".stripMargin.replace('\n', ' ')),
      bench = true)
  )

  /** io19's z-ordered layout, written ONCE per (session, sfDir) — the
    * io17 promotion discipline: benching the skipping read requires the
    * layout write OUT of the timed path (an in-build write would time
    * the shuffle+sort, not the pruned scan). lineitem is a read-only
    * driver fixture, so the copy can never go stale within a session;
    * octave runs at a new sfDir re-write. */
  private val zOrderFixtureFor =
    scala.collection.mutable.Map[(Int, String), String]()
  private def ensureZOrderFixture(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    synchronized {
      zOrderFixtureFor.getOrElseUpdate(
        (System.identityHashCode(s), d), {
          val dir = Dml.work("io19", d)
          Layouts.writeZOrdered(
            s, Tables.t(s, d, "lineitem"), dir,
            "l_orderkey", "l_partkey", 16)
          dir
        })
    }

  /** io17's partitioned fact + lookup dim, written ONCE per
    * (session, sfDir). Promotion to the bench headline set (r13
    * verdict item 4: DPP is the single biggest scan-saver on a
    * partitioned 100 TB fact, and had no timing) requires the setup
    * OUT of the timed path: the old in-build `overwrite` re-wrote the
    * whole partitioned table on every invocation, so the bench would
    * have measured the write, not the pruned join. The memo key is the
    * (session, dir) pair — octave runs at a new sfDir re-write (the
    * Tables.ensureRegistered discipline); orders is a read-only driver
    * fixture, so within one session the copy can never go stale. */
  private val dppFixtureFor = scala.collection.mutable.Map[(Int, String), (String, String)]()
  private def ensureDppFixture(
      s: org.apache.spark.sql.SparkSession, d: String): (String, String) =
    synchronized {
      dppFixtureFor.getOrElseUpdate(
        (System.identityHashCode(s), d), {
          val dir = Dml.work("io17", d) + "/orders_by_priority"
          Tables.t(s, d, "orders").write.mode("overwrite")
            .partitionBy("o_orderpriority").parquet(dir)
          val lookDir = Dml.work("io17", d) + "/priority_lookup"
          s.createDataFrame(Seq(
              ("1-URGENT", "fast"), ("2-HIGH", "fast"),
              ("3-MEDIUM", "slow"), ("4-NOT SPECIFIED", "slow"),
              ("5-LOW", "slow")))
            .toDF("o_orderpriority", "tier")
            .write.mode("overwrite").parquet(lookDir)
          (dir, lookDir)
        })
    }
}
