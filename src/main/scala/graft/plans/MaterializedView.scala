package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** MATERIALIZED-VIEW AUTO-REWRITE — a `Rule[LogicalPlan]` that redirects
  * an aggregate over the base fact to a pre-computed summary table when
  * the summary can answer it exactly (the Calcite/BigQuery/Snowflake MV
  * rewrite, reduced to its rollup kernel).
  *
  * Why this matters at 100 TB: the repeated-dashboard aggregate is the
  * single most common query shape over a big fact, and every run of it
  * re-scans the fact. A summary at (dims × measures) granularity is
  * typically 4-6 orders of magnitude smaller; rewriting the query plan
  * to scan the summary — transparently, with the query text unchanged —
  * is the one optimizer move that beats any amount of pushdown/pruning
  * on the base table. The rewrite composes with everything downstream
  * (the rewritten plan is ordinary Catalyst — codegen, AQE, partial
  * aggregation all still apply to the rollup).
  *
  * Soundness rules (each checked structurally; on ANY doubt the rule
  * declines and the query runs on the base table — a wrong rewrite is
  * silent wrong answers, so every guard fails toward "no rewrite"):
  *
  *  - SHAPE: `Aggregate` over (optional `Filter`s / pruning `Project`s
  *    over) exactly the REGISTERED base relation (matched by the scan's
  *    root paths).
  *  - FRESHNESS: the query-plan leaf's own file listing must equal the
  *    listing fingerprinted at registration — a base table that gained
  *    or rewrote files since the MV was built serves the base, never a
  *    stale summary (the [[IndexSupport]] staleness contract; the check
  *    reads the leaf's already-materialized FileIndex, no extra IO).
  *  - DIMENSIONS: every grouping expression and every filter column is
  *    a bare MV dimension attribute — grouping by a SUBSET of the MV
  *    dims is the rollup case and is allowed; any non-dim reference
  *    declines.
  *  - MEASURES: every aggregate call in the SELECT must match a
  *    registered MV measure STRUCTURALLY (same function over the same
  *    input expression, compared with exprIds/qualifiers stripped), and
  *    roll up losslessly: sum→sum of partial sums, count→sum of partial
  *    counts, min→min of partial mins, max→max of partial maxes. avg &
  *    distinct aggregates do NOT decompose over partial groups and are
  *    declined (a production registry answers avg via sum/count pairs).
  *  - TYPES: the rolled-up aggregate is cast back to the original
  *    expression's type when widening differs (sum over decimal partial
  *    sums widens); output attribute NAMES and EXPR IDS are preserved
  *    via aliases so every parent operator re-binds unchanged.
  *
  * The rule installs into `spark.experimental.extraOptimizations` — the
  * documented user-rule extension point of the Catalyst optimizer — so
  * EVERY downstream consumer (Verify's parquet write, Bench's noop sink,
  * a user's own actions) re-derives the rewrite on its own
  * QueryExecution; nothing needs plan pinning. Fixed-point safe: a
  * rewritten aggregate scans the MV relation, whose roots match no
  * registered BASE, so the rule cannot fire twice.
  */
object Mv {

  /** One registered summary: where the base lives (scan-root identity +
    * file listing + its fingerprint), the MV's dimension columns, its
    * measure catalog (structural agg key → rollup kind + MV column),
    * the analyzed MV relation to instantiate per rewrite, and what
    * [[refreshIncremental]] needs to re-derive the summary (the
    * defining agg columns, the current materialization path, and the
    * refresh epoch that versions it). */
  final case class MvDef(
      name: String,
      baseRoots: Set[String],
      baseFiles: Set[String],
      baseFilesFp: String,
      dims: Set[String],
      dimCols: Seq[String],
      aggCols: Seq[Column],
      measures: Map[String, (String, String)],
      mvPath: String,
      epoch: Int,
      mvRelation: LogicalRelation)

  /** Registered MVs, keyed by base-relation root-path set. One MV per
    * base table is the POC surface; a production registry holds many and
    * picks the cheapest covering summary. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[Set[String], MvDef]()

  /** Kill switch for control-arm measurements (spec/bench baselines). */
  @volatile private[graft] var enabled = true

  /** Run `body` with the rewrite disabled — the control arm. */
  private[graft] def withDisabled[T](body: => T): T = {
    val was = enabled
    enabled = false
    try body finally enabled = was
  }

  private def structKey(af: Expression): String =
    af.transform {
      case a: AttributeReference => a.withQualifier(Nil)
    }.sql

  private def fingerprint(files: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    files.sorted.foreach(f => md.update(f.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private def leafRelation(plan: LogicalPlan): Option[LogicalRelation] =
    plan.collectLeaves() match {
      case Seq(l: LogicalRelation) => Some(l)
      case _ => None
    }

  private def rootsOf(l: LogicalRelation): Set[String] =
    l.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.map(_.toString).toSet
      case _ => Set.empty
    }

  private def filesOf(l: LogicalRelation): Seq[String] =
    l.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.inputFiles.toSeq
      case _ => Seq.empty
    }

  /** Per-FileIndex fingerprint memo: the freshness check runs on EVERY
    * matching aggregate's optimization, and at 100 TB a base table's
    * listing is millions of paths — MB-scale hashing per query plan. A
    * FileIndex instance's listing is immutable (a new scan of a changed
    * table builds a NEW index), so the fingerprint is cached weakly per
    * instance: repeated plans over one relation hash once. */
  // IDENTITY-keyed, not equals-keyed: FileIndex.equals compares root
  // paths, so an equals-keyed map would serve a PRE-append fingerprint
  // for a fresh index over the changed table — exactly the staleness
  // the check exists to catch. A hit must be the same INSTANCE (`eq`);
  // an identityHashCode collision therefore degrades to a miss, never
  // a wrong answer. Weak refs + a size-bounded sweep keep dead index
  // instances from pinning the map.
  private val fpCache = new java.util.concurrent.ConcurrentHashMap[
    Integer, (java.lang.ref.WeakReference[AnyRef], String)]()
  private def fingerprintOf(l: LogicalRelation): String = l.relation match {
    case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
      val loc = fs.location
      val k = Integer.valueOf(System.identityHashCode(loc))
      val hit = fpCache.get(k)
      if (hit != null && (hit._1.get() eq loc)) hit._2
      else {
        val fp = fingerprint(filesOf(l))
        fpCache.put(k,
          (new java.lang.ref.WeakReference[AnyRef](loc), fp))
        if (fpCache.size() > 1024)
          fpCache.entrySet().removeIf(e => e.getValue._1.get() == null)
        fp
      }
    case _ => fingerprint(filesOf(l))
  }

  /** The lossless-rollup kind for an MV-defining aggregate function, or
    * None when the function does not decompose over partial groups.
    * `hll` is the MERGEABLE-SKETCH measure: an HLL sketch of a union is
    * exactly the register-wise max of the parts' sketches, so a summary
    * storing `hll_sketch_agg(x)` per group answers
    * `hll_sketch_estimate(hll_sketch_agg(x))` at ANY coarser grain via
    * `hll_union_agg` — the 100 TB distinct-count pattern (distinct
    * users per segment/day without rescanning the fact), and the one
    * approximate aggregate that folds EXACTLY (same binary sketches in,
    * same estimate out). */
  private def rollupKind(af: AggregateFunction): Option[String] = af match {
    case _: Sum => Some("sum")
    case _: Count => Some("sum") // counts roll up by summing per-group counts
    case _: Min => Some("min")
    case _: Max => Some("max")
    case _: HllSketchAgg => Some("hll")
    case _ => None
  }

  /** Define + materialize a summary over `base` and register it for
    * rewrite. `aggCols` must be ALIASED aggregate columns (sum/count/
    * min/max); anything else is rejected here, at registration, rather
    * than silently never matching at query time. */
  def register(
      spark: SparkSession,
      name: String,
      base: DataFrame,
      dims: Seq[String],
      aggCols: Seq[Column],
      mvPath: String,
      epoch: Int = 0): MvDef = {
    require(aggCols.nonEmpty, "register: at least one measure")
    val mvDf = base.groupBy(dims.map(base(_)): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    Layouts.deleteDir(spark, mvPath)
    // materialize with the rule OFF: a prior registration for the SAME
    // base is still live, and the summary query matches it by
    // construction — the write would otherwise be rewritten to scan
    // the very directory the line above just deleted
    Mv.withDisabled {
      mvDf.write.mode(SaveMode.Overwrite).parquet(mvPath)
    }
    val baseLeaf = leafRelation(base.queryExecution.analyzed).getOrElse(
      throw new IllegalArgumentException(
        "register: base must be a single file-relation scan"))
    val aggPlan = mvDf.queryExecution.analyzed.collectFirst {
      case a: Aggregate => a
    }.get
    val measures = aggPlan.aggregateExpressions.flatMap {
      case al @ Alias(ae: AggregateExpression, _) =>
        val kind = rollupKind(ae.aggregateFunction).getOrElse(
          throw new IllegalArgumentException(
            s"register: measure '${al.name}' (${ae.sql}) does not roll " +
              "up losslessly; use sum/count/min/max"))
        Some(structKey(ae.aggregateFunction) -> (kind, al.name))
      case _ => None // the dim columns
    }
    // two measures with one underlying expression collapse to a single
    // structural key — the survivor's column would silently serve both
    // aliases and refresh would lose the other column; reject loudly
    require(measures.map(_._1).distinct.size == measures.size,
      "register: duplicate measure expressions " +
        s"(${measures.map(_._1).mkString("; ")}) — alias ONE column per " +
        "distinct aggregate expression")
    val mvRel = leafRelation(
      spark.read.parquet(mvPath).queryExecution.analyzed).get
    val files = filesOf(baseLeaf)
    val d = MvDef(name, rootsOf(baseLeaf), files.toSet, fingerprint(files),
      dims.toSet, dims, aggCols, measures.toMap, mvPath, epoch, mvRel)
    registry.put(d.baseRoots, d)
    install(spark)
    d
  }

  /** INCREMENTAL MV MAINTENANCE for an APPEND-ONLY base (the
    * insert-stream IVM every production MV engine ships first): list
    * the base, aggregate ONLY the files added since the last
    * registration/refresh, and fold the partial summary into the
    * existing one measure-by-measure (sum+=sum, count+=count via its
    * sum column, min/max fold) — O(delta + MV size) work instead of
    * O(base). At 100 TB with a daily 0.1% append that is the
    * difference between a minutes refresh and re-scanning the fact.
    * Every registered measure is decomposable by construction
    * ([[register]] rejects the rest), so the fold is exact.
    *
    * Append-only is the contract: a REMOVED or rewritten base file
    * invalidates partial folds (a min can't un-fold), so that case
    * REBUILDS from scratch — correct at full cost, never silently
    * wrong. The refreshed summary lands at a NEW versioned path
    * (`<mvPath>_r<epoch>`) and the registry swaps atomically, so an
    * in-flight rewritten plan keeps reading the old (still valid for
    * its captured listing) files. Returns (delta files aggregated,
    * total base files now; -1 delta signals the rebuild path). */
  def refreshIncremental(
      spark: SparkSession, baseRoots: Set[String]): (Int, Int) = {
    val d = Option(registry.get(baseRoots)).getOrElse(
      throw new IllegalArgumentException(
        s"refreshIncremental: no MV registered for $baseRoots"))
    val baseNow = spark.read.parquet(d.baseRoots.toSeq: _*)
    val leaf = leafRelation(baseNow.queryExecution.analyzed).get
    val nowFiles = filesOf(leaf).toSet
    val removed = d.baseFiles -- nowFiles
    if (removed.nonEmpty) {
      // compaction/delete rewrote history — partial folds can't track
      // that; rebuild the summary from the current base. The epoch
      // carries forward: a rebuild registered at epoch 0 would compute
      // its NEXT refresh path equal to its own live path and delete
      // the summary out from under the fold's read
      register(spark, d.name, baseNow, d.dimCols, d.aggCols,
        s"${d.mvPath.replaceAll("_r\\d+$", "")}_r${d.epoch + 1}",
        epoch = d.epoch + 1)
      return (-1, nowFiles.size)
    }
    val delta = (nowFiles -- d.baseFiles).toSeq
    if (delta.isEmpty) return (0, nowFiles.size)
    val deltaDf = spark.read.parquet(delta: _*)
    val deltaAgg = deltaDf.groupBy(d.dimCols.map(deltaDf(_)): _*)
      .agg(d.aggCols.head, d.aggCols.tail: _*)
    val oldMv = spark.read.parquet(d.mvPath)
    import org.apache.spark.sql.functions.{col, hll_union_agg, max => fmax, min => fmin, sum => fsum}
    val folds = d.measures.values.toSeq.map { case (kind, name) =>
      val t = oldMv.schema(name).dataType
      (kind match {
        case "sum" => fsum(col(name))
        case "min" => fmin(col(name))
        case "max" => fmax(col(name))
        case "hll" => hll_union_agg(col(name))
      }).cast(t).as(name) // sum widens; fold back to the MV type
    }
    val folded = oldMv.unionByName(deltaAgg)
      .groupBy(d.dimCols.map(col): _*)
      .agg(folds.head, folds.tail: _*)
      // column ORDER must match the MV relation (keep the summary
      // schema stable across refresh epochs)
      .select(oldMv.columns.map(col).toIndexedSeq: _*)
    val newPath = s"${d.mvPath.replaceAll("_r\\d+$", "")}_r${d.epoch + 1}"
    Layouts.deleteDir(spark, newPath)
    folded.write.mode(SaveMode.Overwrite).parquet(newPath)
    val newRel = leafRelation(
      spark.read.parquet(newPath).queryExecution.analyzed).get
    registry.put(d.baseRoots, d.copy(
      baseFiles = nowFiles, baseFilesFp = fingerprint(nowFiles.toSeq),
      mvPath = newPath, epoch = d.epoch + 1, mvRelation = newRel))
    (delta.size, nowFiles.size)
  }

  /** The registered MV named `name`, if any (names are unique per
    * registration call; the last registration under a name wins). */
  def byName(name: String): Option[MvDef] = {
    import scala.jdk.CollectionConverters._
    registry.values.asScala.find(_.name == name)
  }

  /** [[refreshIncremental]] by MV name — the SQL statement surface's
    * lookup form. */
  def refreshIncremental(spark: SparkSession, name: String): (Int, Int) =
    refreshIncremental(spark,
      byName(name).getOrElse(throw new IllegalArgumentException(
        s"Materialized view: $name does not exist")).baseRoots)

  /** Unregister `name` and delete its materialization. Returns false
    * when no such MV exists (the IF EXISTS contract). */
  def drop(spark: SparkSession, name: String): Boolean =
    byName(name) match {
      case Some(d) =>
        registry.remove(d.baseRoots)
        Layouts.deleteDir(spark, d.mvPath)
        true
      case None => false
    }

  /** Idempotently add [[MvRewrite]] to the session optimizer's
    * user-rule batch. */
  def install(spark: SparkSession): Unit = {
    val exp = spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(MvRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ MvRewrite
  }

  /** The optimizer rule. Matches registered (base, shape) pairs and
    * swaps the scan; declines everything else untouched. */
  object MvRewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (!enabled || registry.isEmpty) plan
      else plan.transformDown {
        case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
      }

    /** Peel pruning Projects / Filters down to the single scan leaf,
      * collecting filter predicates. Any other operator declines. */
    private def unwrap(p: LogicalPlan)
        : Option[(Seq[Expression], LogicalRelation)] = p match {
      case Filter(cond, c) =>
        unwrap(c).map { case (fs, leaf) => (cond +: fs, leaf) }
      case Project(cols, c) if cols.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(c)
      case l: LogicalRelation => Some((Seq.empty, l))
      case _ => None
    }

    private def tryRewrite(agg: Aggregate): Option[Aggregate] = for {
      // GLOBAL aggregates decline: their single group exists even over
      // zero rows, and count-rolled-to-sum returns NULL there where
      // count returns 0 (grouped queries have no empty groups, so the
      // rollup is only sound under a GROUP BY)
      _ <- if (agg.groupingExpressions.nonEmpty) Some(()) else None
      (filters, leaf) <- unwrap(agg.child)
      mv <- Option(registry.get(rootsOf(leaf)))
      // freshness: the query's own scan listing vs the registered one
      if fingerprintOf(leaf) == mv.baseFilesFp
      // grouping: bare dim attributes only (subsets roll up)
      groupNames <- {
        val names = agg.groupingExpressions.map {
          case a: AttributeReference if mv.dims(a.name) => Some(a.name)
          case _ => None
        }
        if (names.forall(_.isDefined)) Some(names.flatten.toSet) else None
      }
      // filters: deterministic, over dim attributes only, and free of
      // subqueries (their inner plans hold bindings the scan swap
      // cannot re-map)
      if filters.forall(f => f.deterministic &&
        f.references.forall(a => mv.dims(a.name)) &&
        !f.exists(_.isInstanceOf[PlanExpression[_]]))
      rewritten <- rewriteAgg(agg, filters, mv, groupNames)
    } yield rewritten

    private def rewriteAgg(
        agg: Aggregate,
        filters: Seq[Expression],
        mv: MvDef,
        groupNames: Set[String]): Option[Aggregate] = {
      // fresh attribute ids per use — two rewrites in one query must not
      // collide on the shared analyzed relation's ids
      val rel = mv.mvRelation.newInstance()
      val mvAttr = rel.output.map(a => a.name -> a).toMap

      /** Translate a result-side expression: aggregate calls roll up to
        * the MV measure, grouped dims rebind to the MV attribute, and
        * any deterministic scaffold (casts, arithmetic, literals) maps
        * over its children. None anywhere declines the whole rewrite. */
      def rw(e: Expression): Option[Expression] = e match {
        case ae: AggregateExpression
            if ae.filter.isEmpty && !ae.isDistinct =>
          mv.measures.get(structKey(ae.aggregateFunction)).map {
            case (kind, mvCol) =>
              val f = kind match {
                case "sum" => Sum(mvAttr(mvCol))
                case "min" => Min(mvAttr(mvCol))
                case "max" => Max(mvAttr(mvCol))
                case "hll" => new HllUnionAgg(mvAttr(mvCol))
              }
              val rolled = AggregateExpression(f, Complete, isDistinct = false)
              if (rolled.dataType == ae.dataType) rolled
              else Cast(rolled, ae.dataType)
          }
        // an aggregate the case above did NOT take (FILTER clause,
        // DISTINCT, unregistered function) must STOP here — the generic
        // recursion below would rebuild it over MV rows and silently
        // answer from the wrong grain
        case _: AggregateExpression => None
        case a: AttributeReference =>
          if (groupNames(a.name)) mvAttr.get(a.name) else None
        case l: Literal => Some(l)
        // a subquery carries its own PLAN, not children — the generic
        // recursion below would wave it through while it may reference
        // the very relation being swapped; decline
        case _: PlanExpression[_] => None
        case other if other.deterministic && other.children.nonEmpty =>
          val kids = other.children.map(rw)
          if (kids.forall(_.isDefined))
            Some(other.withNewChildren(kids.map(_.get)))
          else None
        case _ => None
      }

      val newRes: Seq[Option[NamedExpression]] =
        agg.aggregateExpressions.map {
          case a: AttributeReference =>
            rw(a).map(e => Alias(e, a.name)(exprId = a.exprId))
          case al: Alias =>
            rw(al.child).map(e => Alias(e, al.name)(exprId = al.exprId))
          case _ => None
        }
      if (newRes.exists(_.isEmpty)) return None
      val newGrouping = agg.groupingExpressions.map {
        case a: AttributeReference => mvAttr(a.name)
      }
      val newChild =
        if (filters.isEmpty) rel
        else Filter(
          filters.reduce(And).transform {
            case a: AttributeReference => mvAttr(a.name)
          }, rel)
      Some(Aggregate(newGrouping, newRes.map(_.get), newChild))
    }
  }
}

/** q61 under the driver's hash gate: the rewrite changes the SCAN, never
  * the rows — the oracle runs the same SQL on the base table. */
object MvQueries {
  import org.apache.spark.sql.functions._

  // (session, sfDir) the lineitem summary is registered for — octave
  // runs at a new sfDir re-materialize + re-register (the
  // Tables.ensureRegistered discipline); the fixture tables are
  // read-only, so within one (session, dir) the MV can never go stale
  // (and the rule's file-fingerprint check enforces that, not this memo).
  private val mvFor = scala.collection.mutable.Map[(Int, String), Unit]()
  private[graft] def ensureMv(s: SparkSession, d: String): Unit =
    synchronized {
      mvFor.getOrElseUpdate((System.identityHashCode(s), d), {
        Mv.register(s, "lineitem_by_flag_status",
          Tables.t(s, d, "lineitem"),
          dims = Seq("l_returnflag", "l_linestatus"),
          aggCols = Seq(
            count(lit(1)).as("mv_cnt"),
            sum(col("l_quantity").cast("decimal(18,2)")).as("mv_sum_qty"),
            max(col("l_extendedprice")).as("mv_max_price")),
          mvPath = Dml.work("q61_mv", d) + "/lineitem_summary")
        ()
      })
    }

  /** The dashboard rollup: groups by a SUBSET of the MV dims, filters on
    * the other — the summary answers it without touching the fact. */
  private[graft] def rollupQuery(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "lineitem")
      .filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"),
        max(col("l_extendedprice")).as("max_price"))

  val queries: Seq[Q] = Seq(
    Q("q61_mv_rewrite",
      (s, d) => {
        ensureMv(s, d)
        rollupQuery(s, d)
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |AS sum_qty, max(l_extendedprice) AS max_price
             |FROM lineitem WHERE l_linestatus = 'F'
             |GROUP BY 1""".stripMargin.replace('\n', ' ')),
      bench = true,
      explainOverride = Some((s, d) => {
        ensureMv(s, d)
        val on = rollupQuery(s, d).queryExecution.optimizedPlan.toString
        // the OFF plan must be RENDERED inside the disabled scope — a
        // pinned plan re-optimized outside it would re-fire the rule
        val off = Mv.withDisabled {
          rollupQuery(s, d).queryExecution.optimizedPlan.toString
        }
        "== Optimized plan, MV rewrite ON (scan = lineitem_summary) ==\n" +
          on +
          "\n== Optimized plan, MV rewrite OFF (scan = base lineitem) ==\n" +
          off
      })),

    // INCREMENTAL MV MAINTENANCE end to end: a private base copy of
    // lineitem gains an append (the deterministic l_orderkey % 97
    // slice), refreshIncremental folds ONLY the delta files into the
    // summary, and the gated rollup reads through the REFRESHED MV —
    // the oracle restates base ∪ slice on the fixture tables, so the
    // hash gate proves the O(delta) fold equals the full recompute.
    Q("q62_mv_incremental",
      (s, d) => {
        val baseDir = ensureIncremental(s, d)
        val base = s.read.parquet(baseDir)
        base.filter(col("l_linestatus") === "F")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"))
      },
      Some("""WITH base AS (SELECT * FROM lineitem UNION ALL
             |SELECT * FROM lineitem WHERE l_orderkey % 97 = 0)
             |SELECT l_returnflag, count(*) AS n,
             |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |AS sum_qty FROM base WHERE l_linestatus = 'F'
             |GROUP BY 1""".stripMargin.replace('\n', ' '))),

    // The SQL statement surface of the MV subsystem: CREATE
    // MATERIALIZED VIEW registers + materializes through Mv.register,
    // and the follow-up aggregate — issued as PLAIN SQL with no
    // mention of the view — reads the summary transparently. On
    // `orders`, not lineitem: the registry keys by base scan roots,
    // and a second lineitem registration would replace q61's (last
    // wins) with a different measure set mid-session. The oracle is
    // the same aggregate on the base table, so the hash gate proves
    // statement-created summaries answer exactly. REFRESH/DROP
    // lifecycle evidence is MvSpec's.
    Q("q63_sql_mv",
      (s, d) => {
        val ctx = new ExecutionContext(s).registerTestData(d)
        ctx.execute("DROP MATERIALIZED VIEW IF EXISTS sql_orders_summary")
        ctx.execute("""CREATE MATERIALIZED VIEW sql_orders_summary AS
          SELECT o_orderpriority, o_orderstatus, count(1) AS mv_cnt,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mv_total
          FROM orders GROUP BY o_orderpriority, o_orderstatus""")
        ctx.execute("""SELECT o_orderpriority, count(1) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS total FROM orders WHERE o_orderstatus = 'F'
          GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |AS total FROM orders WHERE o_orderstatus = 'F'
             |GROUP BY 1""".stripMargin.replace('\n', ' '))),

    // MERGEABLE-SKETCH MEASURE: the MV stores hll_sketch_agg(c_custkey)
    // per (mktsegment, nation) and the query's coarser-grain
    // hll_sketch_estimate(hll_sketch_agg(...)) rewrites to
    // estimate(hll_union_agg(sketch)) — distinct customers per segment
    // answered from the summary. Rows-only: the estimate is
    // sketch-implementation-specific (no DuckDB twin), but it is
    // DETERMINISTIC, and MvSpec proves the rewrite returns the
    // BIT-IDENTICAL estimate of the unrewritten plan (union of
    // per-group sketches == sketch of the union). The audit twin below
    // carries the exact-distinct contract under the driver hash.
    Q("q64_mv_hll",
      (s, d) => {
        ensureHll(s, d)
        Tables.t(s, d, "customer")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            hll_sketch_estimate(hll_sketch_agg(col("c_custkey")))
              .as("approx_customers"))
      },
      None),

    // The exact twin of q64 under the driver hash: the same grouping
    // with COUNT(DISTINCT) — declined by the rewrite (distinct does not
    // decompose), so it runs on the base and pins the true values the
    // sketch approximates; MvSpec asserts the relative error bound.
    Q("q64_mv_hll_audit",
      (s, d) => {
        ensureHll(s, d)
        Tables.t(s, d, "customer")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("c_custkey")).as("exact_customers"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |count(DISTINCT c_custkey) AS exact_customers
             |FROM customer GROUP BY 1""".stripMargin.replace('\n', ' ')))
  )

  // (session, sfDir) -> the customer sketch summary registration.
  private val hllFor = scala.collection.mutable.Map[(Int, String), Unit]()
  private[graft] def ensureHll(s: SparkSession, d: String): Unit =
    synchronized {
      hllFor.getOrElseUpdate((System.identityHashCode(s), d), {
        Mv.register(s, "customer_sketches",
          Tables.t(s, d, "customer"),
          dims = Seq("c_mktsegment", "c_nationkey"),
          aggCols = Seq(
            count(lit(1)).as("mv_cnt"),
            hll_sketch_agg(col("c_custkey")).as("mv_customers")),
          mvPath = Dml.work("q64_mv", d) + "/customer_summary")
        ()
      })
    }

  // (session, sfDir) -> the appended base-copy dir with its summary
  // registered AND incrementally refreshed; built once per pair.
  private val incFor = scala.collection.mutable.Map[(Int, String), String]()
  private[graft] def ensureIncremental(
      s: SparkSession, d: String): String =
    synchronized {
      incFor.getOrElseUpdate((System.identityHashCode(s), d), {
        val root = Dml.work("q62_mv_inc", d)
        Layouts.deleteDir(s, root)
        val baseDir = s"$root/base"
        Tables.t(s, d, "lineitem").write.parquet(baseDir)
        val def0 = Mv.register(s, "lineitem_inc", s.read.parquet(baseDir),
          dims = Seq("l_returnflag", "l_linestatus"),
          aggCols = Seq(
            count(lit(1)).as("mv_cnt"),
            sum(col("l_quantity").cast("decimal(18,2)")).as("mv_sum_qty")),
          mvPath = s"$root/summary")
        Tables.t(s, d, "lineitem")
          .filter(col("l_orderkey") % 97 === 0)
          .write.mode("append").parquet(baseDir)
        val (delta, total) = Mv.refreshIncremental(s, def0.baseRoots)
        require(delta > 0 && delta < total,
          s"q62 fixture: expected a strict delta fold, got $delta/$total")
        baseDir
      })
    }
}
