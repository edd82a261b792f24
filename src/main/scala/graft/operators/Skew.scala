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

  /** Two-phase salted SUM/COUNT aggregation of `valueCol` by `keyCol`.
    * The salt MUST come from a per-ROW source (row position), never from
    * the data: a hot key whose rows share one value — the classic skew
    * shape — would hash that value into a single salt bucket and silently
    * collapse phase one back to one reducer. (Hashing the WHOLE row fails
    * the same way on duplicate-heavy hot keys.) The aggregate is algebraic,
    * so the result is independent of how rows spread across salts.
    *
    * INPUT CONTRACT: feed a deterministic scan (file source, cached frame).
    * `monotonically_increasing_id` is position-derived, so if the input is
    * itself a nondeterministic shuffle output, a partial-stage retry can
    * re-salt rows between attempts (the SPARK-23207 hazard) — repartition
    * deterministically (or persist) first in that case. Every engine query
    * feeds file scans, which replay identically. */
  /** Phase one of [[saltedAgg]]: partial aggregate on (key, salt) —
    * exposed for tests asserting the hot key really spreads. */
  private[graft] def saltedPartials(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salts: Int): DataFrame = {
    require(!df.columns.contains("_salt"),
      "saltedAgg: reserved column _salt present in input")
    df.withColumn("_salt",
        (monotonically_increasing_id() % salts).cast("int"))
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        sum(col(valueCol).cast("decimal(18,2)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
  }

  def saltedAgg(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salts: Int = 16): DataFrame =
    saltedPartials(df, keyCol, valueCol, salts)
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
    require(!big.columns.contains("_salt") &&
      !small.columns.contains("_salt"),
      "saltedJoin: reserved column _salt present in input")
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

  /** AQE RUNTIME SKEW-JOIN — the mitigation you reach for BEFORE
    * salting: declare a plain sort-merge join (MERGE hints pin the
    * strategy — a broadcast would dissolve the skew instead of
    * exercising the split) and let adaptive execution split oversized
    * shuffle partitions at runtime, replicating the matching dim-side
    * partition per split. No rewrite of the query, no salt column, and
    * the split preserves join semantics exactly — which is precisely
    * what the k03 hash gate holds (row-exact output under whatever
    * split AQE chose). Thresholds are session confs; the entry scopes
    * aggressive values so the split fires even at fixture scale, and
    * SkewLayoutSpec asserts the executed plan really shows the
    * skew-split join. */
  def aqeSkewJoin(
      big: DataFrame,
      dim: DataFrame,
      bigKey: String,
      dimKey: String): DataFrame =
    big.hint("MERGE").join(dim.hint("MERGE"),
      col(bigKey) === col(dimKey))

  /** k03's skewed probe side. The leading hash repartition on
    * `l_orderkey` stands in for MAPPER PARALLELISM: AQE's skew split
    * carves a hot reduce partition along map-output boundaries
    * (`PartialReducerPartitionSpec` ranges of map indices), so it needs
    * many mappers feeding the join exchange. A 100 TB scan has thousands;
    * the sf0.1 fixture is one single-row-group file = ONE mapper, which
    * leaves AQE nothing to split (r12's PLANS.md showed the hot partition
    * surviving as `coalesced`). The uniform-key repartition restores the
    * mapper granularity the split needs without touching row content, so
    * the committed plan carries the same `skew=true` join a production
    * scan would get for free. */
  private[graft] def k03Big(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"))
      .repartition(32, col("l_orderkey"))
      .select(
        when(col("l_orderkey") % 4 =!= 0, 0L)
          .otherwise(col("l_orderkey") % 50).as("hk"),
        col("l_orderkey"), col("l_linenumber"))

  /** Run `body` with aggressive AQE skew-split thresholds, restoring
    * the session values after — the scoped-conf discipline the
    * RocksDB streaming entries use.
    *
    * `advisoryBytes` is the split granularity AND the skew threshold.
    * It must SCALE WITH THE INPUT: the advisory size bounds every
    * AQE-read partition in the query, so a fixed tiny value (16 KiB,
    * the r12 setting) that merely guarantees a fixture-scale split
    * turns into tens of thousands of sub-16KiB tasks at sf2+ — the
    * r13 scale run measured k03 at 22.5 s/2x-data from exactly that.
    * Callers with a real input should pass [[advisoryFor]]'s value
    * (input/64, i.e. a constant ~48-way split of the hot partition
    * whatever the scale); the default stays tiny only for synthetic
    * spark.range fixtures in specs. At production scale none of this
    * applies: the defaults (256 MiB threshold / 64 MiB advisory) are
    * already right when partitions carry gigabytes. */
  private[graft] def withSkewConfs[T](
      spark: org.apache.spark.sql.SparkSession,
      advisoryBytes: Long = 16384)(body: => T): T = {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "1.0")
      spark.conf.set(keys(1), advisoryBytes.toString)
      spark.conf.set(keys(2), advisoryBytes.toString)
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Run `body` with runtime bloom-filter injection live at fixture
    * scale, restoring session values after. Two overrides, both scale
    * artifacts, not semantics: the application-side scan threshold
    * (default 10 GiB — InjectRuntimeFilter refuses to protect a scan
    * that small because the filter costs more than it saves on a real
    * cluster) drops to 0, and broadcast is disabled because the rule
    * only fires for SHUFFLE joins (a broadcast join never shuffles the
    * fact, so there is nothing for a bloom filter to save). At
    * production scale neither override exists: a 100 TB fact clears the
    * threshold on its own and a corpus-scale dim is not broadcastable. */
  private[graft] def withBloomConfs[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "0")
      spark.conf.set(keys(2), "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Scale-aware advisory size for [[withSkewConfs]]: 1/64 of the
    * on-disk input, clamped to [16 KiB, 64 MiB]. The hot partition is a
    * constant fraction of the input by construction, so this yields a
    * roughly constant split COUNT (~48 for k03's 75%-hot key) at every
    * scale factor — the property a fixed byte value lacks. The 64 MiB
    * ceiling is Spark's own default advisory: past it the fixture
    * argument is moot and production defaults take over. */
  private[graft] def advisoryFor(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, table: String): Long = {
    // Hadoop FileSystem, not java.io.File: a java.io probe returns 0 for
    // any non-local dir (hdfs://, s3a://, even a file: URI), which
    // clamped every cluster run to the 16 KiB floor — tens of thousands
    // of tiny advisory splits, the exact pathology this sizing exists to
    // fix (r13 advice). getContentSummary resolves through whatever
    // filesystem the path names.
    // The WHOLE probe degrades to "unknown" on any failure — including
    // Path's own IllegalArgumentException on a malformed URI and
    // non-IO RuntimeExceptions from getFileSystem: the old java.io
    // probe could never throw, and a sizing heuristic must not be the
    // thing that kills the query (it has a safe default for exactly
    // this case).
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      } catch { case scala.util.control.NonFatal(_) => 0L }
    // Probe found nothing → Spark's own default advisory (64 MiB), NOT
    // the 16 KiB floor: an unknown input is far more likely production-
    // sized than fixture-sized, and the floor is the dangerous end.
    if (bytes == 0L) 64L << 20
    else math.min(math.max(bytes / 64, 16384L), 64L << 20)
  }
}

/** Oracle-checked twin for the skew machinery: a salted aggregate equals
  * the plain GROUP BY it replaces, so the two-phase plan runs under the
  * driver's DuckDB hash gate, not only under ScalaTest. */
object SkewQueries {
  val queries: Seq[Q] = Seq(
    Q("k01_salted_agg",
      (s, d) => Skew.saltedAgg(
        Tables.t(s, d, "lineitem"), "l_returnflag", "l_quantity", salts = 16),
      Some("""SELECT l_returnflag,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             |count(*) AS n FROM lineitem GROUP BY l_returnflag"""
        .stripMargin.replace('\n', ' '))),

    Q("k02_salted_join",
      (s, d) => Skew.saltedJoin(
          Tables.t(s, d, "orders").select("o_orderkey", "o_custkey"),
          Tables.t(s, d, "customer").select("c_custkey", "c_name"),
          "o_custkey", "c_custkey", salts = 16)
        .select("o_orderkey", "c_name"),
      Some("""SELECT o_orderkey, c_name FROM orders
             |JOIN customer ON o_custkey = c_custkey"""
        .stripMargin.replace('\n', ' '))),

    // AQE RUNTIME SKEW-JOIN under the hash gate — ~75% of lineitem
    // collapses onto hot key 0 (the rest spread over 50 keys), the
    // 50-row dim comes from spark.range, and the sort-merge join runs
    // under scoped aggressive split thresholds so AQE's skew handling
    // fires at fixture scale. Execution happens INSIDE the conf scope
    // via an eager localCheckpoint (AQE reads confs at execution, not
    // plan-build), then the confs restore so no later entry inherits
    // 16 KB advisory partitions. The output is row-exact per lineitem
    // line, so a split that duplicated or dropped a row (the failure
    // mode replicating the dim side guards against) would flip the
    // driver gate. SkewLayoutSpec holds the runtime evidence that the
    // executed plan really contains the skew=true join.
    Q("k03_skew_join_aqe",
      (s, d) => Skew.withSkewConfs(s, Skew.advisoryFor(s, d, "lineitem")) {
        val big = Skew.k03Big(s, d)
        val dim = s.range(0, 50).select(col("id").as("dk"),
          concat(lit("d"), col("id")).as("dname"))
        Skew.aqeSkewJoin(big, dim, "hk", "dk")
          .select("l_orderkey", "l_linenumber", "hk", "dname")
          .localCheckpoint()
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |CASE WHEN l_orderkey % 4 <> 0 THEN 0
             |ELSE l_orderkey % 50 END AS hk,
             |'d' || CAST(CASE WHEN l_orderkey % 4 <> 0 THEN 0
             |ELSE l_orderkey % 50 END AS VARCHAR) AS dname
             |FROM lineitem"""
        .stripMargin.replace('\n', ' ')),
      bench = true,
      // The entry's localCheckpoint erases lineage, so a pre-execution
      // explain of `build` shows only `Scan ExistingRDD`. The dump instead
      // executes the same join inside the conf scope (collect() finalizes
      // the adaptive plan on THIS QueryExecution) and commits the final
      // plan — the `skew=true` sort-merge join SkewLayoutSpec asserts.
      explainOverride = Some((s, d) =>
        Skew.withSkewConfs(s, Skew.advisoryFor(s, d, "lineitem")) {
        val big = Skew.k03Big(s, d)
        val dim = s.range(0, 50).select(col("id").as("dk"),
          concat(lit("d"), col("id")).as("dname"))
        val joined = Skew.aqeSkewJoin(big, dim, "hk", "dk")
          .select("l_orderkey", "l_linenumber", "hk", "dname")
        // finalize THIS QueryExecution's adaptive plan without pulling
        // the join output to the driver (collect() would materialize
        // the whole lineitem-sized result when the dump runs at a
        // larger fixture)
        joined.queryExecution.toRdd.count()
        joined.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode) +
          "\n== Executed plan (simpleString — carries the skew flag) ==\n" +
          joined.queryExecution.executedPlan.toString
      })),

    // RUNTIME BLOOM-FILTER JOIN — the row-level complement of io17's
    // partition-level DPP, and the one that works on UNPARTITIONED join
    // keys: when a selective predicate lives on the dim side of a
    // shuffle join, Catalyst's InjectRuntimeFilter builds a
    // bloom_filter_agg over the filtered dim keys and plants
    // might_contain on the fact side BELOW the shuffle, so non-matching
    // fact rows drop before they are ever shuffled — at 100 TB that is
    // the difference between shuffling the full fact and shuffling the
    // selectivity fraction. Scoped confs: the application-side
    // size threshold (10 GiB default — sized for clusters) drops to 0
    // so injection fires at fixture scale, and broadcast is disabled
    // because a broadcast join needs no runtime filter (the mechanism
    // under test only exists for shuffle joins). The bloom is
    // semantically transparent (false positives re-checked by the
    // join), so the hash gate proves end-to-end correctness;
    // SkewLayoutSpec asserts might_contain really sits on the fact scan.
    Q("k04_runtime_bloom_join",
      (s, d) => Skew.withBloomConfs(s) {
        val fact = Tables.t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
        val dim = Tables.t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey", "o_orderpriority")
        fact.join(dim, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("double").as("qty"))
          .localCheckpoint()
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |CAST(l_quantity AS DOUBLE) AS qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'"""
        .stripMargin.replace('\n', ' ')),
      bench = true,
      explainOverride = Some((s, d) => Skew.withBloomConfs(s) {
        val fact = Tables.t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
        val dim = Tables.t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey", "o_orderpriority")
        val joined = fact
          .join(dim, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("double").as("qty"))
        joined.queryExecution.toRdd.count()
        joined.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      }))
  )
}
