package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over the crawl's domain link graph — the seed-quality
  * signal web-scale curation ranks domains by (Common Crawl publishes
  * exactly this: a per-domain centrality from the host link graph, used
  * to prioritize fetch frontiers and weight sources).
  *
  * Scale shape: one PageRank iteration is one join (ranks ⋈ edges on
  * src — shuffle keyed by src) plus one aggregation (sum contributions
  * by dst — shuffle keyed by dst). That is THE distributed PageRank
  * plan; rounds iterate the same two shuffles, and a long-running loop
  * needs d08's lineage-cut discipline (persist + rebuild-from-RDD per
  * round) to keep the plan constant-size. Dangling mass and per-node
  * out-degree division appear in the general form as one extra
  * broadcast scalar and a `/ outdeg` on the contribution — same plan.
  */
object Graph {

  /** Two exact PageRank iterations over a FUNCTIONAL domain graph (every
    * node has out-degree 1), in integer-numerator arithmetic so the
    * result is bit-identical cross-engine: with damping 17/20 and
    * uniform start 1/n, the iterate r_t is a rational with denominator
    * n·20^t, and its numerator obeys
    *   N_1(v) = 3 + 17·indeg(v)
    *   N_2(v) = 60 + 17·Σ_{u→v} N_1(u)
    * — integer sums only; the final rank is one exact integer division
    * rendered as DOUBLE (identical IEEE rounding of identical integers).
    * Out-degree 1 is what makes the numerators integral; the general
    * graph divides contributions by outdeg(u) and moves to doubles,
    * keeping the same join/agg plan. Returns (domain, rank_num, rank).
    */
  def domainPagerank2(docs: DataFrame, n: Int = 50): DataFrame = {
    val nodes = docs.select((col("doc_id") % n).as("v")).distinct()
    // dst is a function of src's residue (out-degree stays 1, which the
    // integer numerators need) but squaring is non-injective mod n, so
    // indegrees vary 0..k and the aggregation round is non-trivial
    val edges = docs.select((col("doc_id") % n).as("src"),
      (((col("doc_id") % n) * (col("doc_id") % n) + 1) % n)
        .as("dst")).distinct()
    val indeg = edges.groupBy("dst").agg(count(lit(1)).as("ind"))
    val r1 = nodes.join(indeg, nodes("v") === indeg("dst"), "left")
      .select(col("v"),
        (lit(3L) + lit(17L) * coalesce(col("ind"), lit(0L))).as("n1"))
    val contrib = edges.join(r1, edges("src") === r1("v"))
      .select(col("dst").as("cv"), col("n1"))
    nodes.join(contrib, col("v") === col("cv"), "left")
      .groupBy(col("v"))
      .agg((lit(60L) + lit(17L) * coalesce(sum(col("n1")), lit(0L)))
        .as("rank_num"))
      .select(col("v").as("domain"), col("rank_num"),
        (col("rank_num").cast("double") / lit(20000.0 / 50 * n)).as("rank"))
  }

  /** Two exact PERSONALIZED-PageRank iterations — [[domainPagerank2]]
    * with the teleport mass restricted to a SEED set (the graph-based
    * data-selection primitive: "rank everything by relevance to these
    * trusted domains"; unlike global PR, mass only enters at seeds and
    * decays through links). Same integer-numerator discipline: with
    * damping 17/20 and uniform start over the |S| seeds, scaling by
    * |S|·20^t gives
    *   N_0(v) = 1_S(v)
    *   N_{t+1}(v) = 3·20^t·1_S(v) + 17·Σ_{u→v} N_t(u)
    * — integer sums only on the out-degree-1 graph; the final score is
    * one exact division by |S|·400 (the denominator), rendered DOUBLE.
    * |S| rides the plan as a broadcast scalar (one-row cross join), so
    * nothing is collected. Scale: two edge-join + groupBy rounds, the
    * g01 shuffle classes; production iterates to tolerance with the
    * fixed-point protocol. */
  def domainPpr2(
      docs: DataFrame,
      n: Int = 50,
      seedBelow: Int = 10): DataFrame = {
    val nodes = docs.select((col("doc_id") % n).as("v")).distinct()
    val edges = docs.select((col("doc_id") % n).as("src"),
      (((col("doc_id") % n) * (col("doc_id") % n) + 1) % n)
        .as("dst")).distinct()
    val seeded = nodes.withColumn("s",
      when(col("v") < seedBelow, 1L).otherwise(0L))
    val n0 = seeded.withColumn("nv", col("s"))
    def round(prev: DataFrame, teleport: Long): DataFrame = {
      val contrib = edges.join(prev, edges("src") === prev("v"))
        .groupBy(col("dst")).agg(sum(col("nv")).as("c"))
      seeded.join(contrib, seeded("v") === contrib("dst"), "left")
        .select(col("v"), col("s"),
          (lit(teleport) * col("s") +
            lit(17L) * coalesce(col("c"), lit(0L))).as("nv"))
    }
    val n2 = round(round(n0, 3L), 60L)
    val nSeeds = seeded.agg(sum(col("s")).as("n_seeds"))
    n2.crossJoin(nSeeds)
      .select(col("v").as("domain"), col("nv").as("ppr_num"),
        (col("nv").cast("double") /
          (col("n_seeds").cast("double") * 400.0)).as("ppr"))
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond") — the production-scale alternative to [[Dedup
    * .duplicateClusters]]' min-label propagation: label propagation
    * needs O(diameter) rounds (a duplicate CHAIN of length L takes L
    * rounds — the d08 non-convergence failure mode), while the star
    * operations contract a path of length L in O(log L) rounds.
    *
    * large-star(u): link every strictly-larger neighbor of u to
    * m = min(Γ(u) ∪ {u}). small-star(u), on edges directed high→low:
    * link u and each smaller neighbor to m. Both are one
    * symmetric-explode + groupBy-min + join per round — the same
    * shuffle classes as label propagation, just O(log) many of them.
    * Converged when the edge set is a fixed point (every component a
    * star centered at its minimum); loud abort if maxIter hits, same
    * contract as d08. Each round rebuilds the frame from the persisted
    * RDD (d08's lineage cut) so the plan stays constant-size.
    *
    * Returns (doc_id, rep) for every node, rep = component minimum. */
  def ccLargeSmallStar(
      nodes: DataFrame,
      edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val spark = nodes.sparkSession
    var e = edges.filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .distinct()
    var cached = ManagedCache.persist(e)
    e = cached
    var sig = checksum(e)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // LARGE-STAR over the symmetric view
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
      // SMALL-STAR on edges directed high→low
      val dir = large.select(col("hi").as("u"), col("lo").as("v"))
      val mins2 = dir.groupBy("u").agg(min(col("v")).as("m"))
      val joined = dir.join(mins2, "u")
      val small = joined
        .select(col("v").as("hi"), col("m").as("lo"))
        .union(joined.select(col("u").as("hi"), col("m").as("lo")))
        .filter(col("hi") =!= col("lo"))
        .distinct()
      val next = ManagedCache.persist(small)
      val nextSig = checksum(next) // materializes `next`
      done = nextSig == sig
      sig = nextSig
      cached.unpersist(blocking = false)
      cached = next
      val slim = next.select("hi", "lo")
      e = spark.createDataFrame(slim.rdd, slim.schema)
      iter += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"ccLargeSmallStar did not reach a fixed point in $maxIter " +
          "rounds — raise maxIter (components contract in O(log n) " +
          "rounds, so this indicates a bug, not a long chain)")
    nodes.join(e.select(col("hi").as("doc_id"), col("lo").as("rep")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep"), col("doc_id")).as("rep"))
  }

  /** HITS hub/authority scores (Kleinberg) over a directed edge set, in
    * EXACT INTEGER arithmetic: with hub⁰ ≡ 1, the unnormalized iterates
    *   auth¹(v) = Σ_{u→v} hub⁰(u) = indeg(v)
    *   hub¹(u)  = Σ_{u→w} auth¹(w)
    *   auth²(v) = Σ_{u→v} hub¹(u)
    * are integer join-sums — the mutually-recursive twin of [[
    * domainPagerank2]]'s centrality (PageRank ranks where mass flows,
    * HITS separates good POINTERS from good TARGETS, the classic
    * seed-list/directory-page split in crawl frontier ranking).
    * Production normalizes per round (L2), which moves to doubles and
    * changes no join/agg shape. Each half-step is one edge⋈score join
    * (shuffle on the score key) + one Σ-by-endpoint — the PageRank plan
    * classes exactly. Returns (domain, auth1, hub1, auth2). */
  def hits2(docs: DataFrame, n: Int = 50): DataFrame = {
    val nodes = docs.select((col("doc_id") % n).as("v")).distinct()
    val edges = docs.select((col("doc_id") % n).as("src"),
      (((col("doc_id") % n) * (col("doc_id") % n) + 1) % n)
        .as("dst")).distinct()
    val a1 = nodes.join(
        edges.groupBy("dst").agg(count(lit(1)).as("ind")),
        nodes("v") === col("dst"), "left")
      .select(col("v"), coalesce(col("ind"), lit(0L)).as("a1"))
    val h1 = nodes.join(
        edges.join(a1, edges("dst") === a1("v"))
          .groupBy("src").agg(sum("a1").as("hs")),
        nodes("v") === col("src"), "left")
      .select(col("v"), coalesce(col("hs"), lit(0L)).as("h1"))
    val a2 = nodes.join(
        edges.join(h1, edges("src") === h1("v"))
          .groupBy("dst").agg(sum("h1").as("as2")),
        nodes("v") === col("dst"), "left")
      .select(col("v"), coalesce(col("as2"), lit(0L)).as("a2"))
    a1.join(h1, "v").join(a2, "v")
      .select(col("v").as("domain"), col("a1").as("auth1"),
        col("h1").as("hub1"), col("a2").as("auth2"))
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected graph — the structural signal crawl curation reads off
    * the domain link graph (link farms and boilerplate mirror rings
    * show up as near-clique neighborhoods; organic link neighborhoods
    * are sparse). `nodes` is one `v` column; `edges` is distinct
    * undirected (lo < hi) pairs.
    *
    * Plan: enumerate each triangle ONCE in id orientation a < b < c —
    * (a,b)⋈(b,c) on the shared endpoint, then a semi-check join for the
    * closing edge (a,c); per-node counts are the 3-way projection of the
    * triangle table; clustering = 2T/deg(deg−1) is one exact integer
    * division (identical IEEE rounding cross-engine). Scale: the
    * (a,b)⋈(b,c) fan-out is Σ_v deg⁺(v)² — production orients each edge
    * from its LOWER-DEGREE endpoint (compact-forward / Latapy), which
    * caps the join at O(m^1.5) regardless of hub skew; id orientation
    * (used here for determinism) is the same plan with a different
    * orientation key, and the switch is one degree join before the
    * enumeration. All three joins shuffle on node keys — no all-pairs
    * stage anywhere. */
  def triangleStats(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // normalize rather than filter: a reversed pair (2,1) is the same
    // undirected edge as (1,2), not a row to drop; self-loops go
    val e = edges
      .select(least(col("lo"), col("hi")).as("lo"),
        greatest(col("lo"), col("hi")).as("hi"))
      .filter(col("lo") < col("hi")).distinct()
    val deg = e.select(col("lo").as("v"))
      .union(e.select(col("hi").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
    val tris = e.as("ab")
      .join(e.as("bc"), col("ab.hi") === col("bc.lo"))
      .join(e.as("ac"), col("ac.lo") === col("ab.lo") &&
        col("ac.hi") === col("bc.hi"))
      .select(col("ab.lo").as("a"), col("ab.hi").as("b"),
        col("bc.hi").as("c"))
    val perNode = tris.select(col("a").as("v"))
      .union(tris.select(col("b").as("v")))
      .union(tris.select(col("c").as("v")))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    nodes.join(deg, Seq("v"), "left").join(perNode, Seq("v"), "left")
      .select(col("v").as("node"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(coalesce(col("degree"), lit(0L)) >= 2,
          (lit(2L) * coalesce(col("n_triangles"), lit(0L))).cast("double")
            / (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** DEGREE ASSORTATIVITY (Newman's r) over an undirected edge set —
    * the one-number structural fingerprint of a link graph: positive =
    * hubs link hubs (social-graph shape), negative = hubs link leaves
    * (the web's classic disassortative shape; a crawl segment that
    * suddenly reads strongly positive is usually a link farm). Both
    * endpoints of every edge contribute symmetrically ((x,y) AND
    * (y,x)), which makes the two marginals identical and collapses
    * Pearson's r to (m·Σxy − (Σx)²)/(m·Σx² − (Σx)²) — integer
    * sufficient statistics with ONE exact final division, no sqrt
    * (the e17/e20 exactness discipline). NULL when the graph is
    * degree-regular (undefined correlation). Scale: degree table =
    * one groupBy, the join is edge⋈degree on node keys twice, the
    * readout a 1-row agg. RANGE NOTE: the Long statistics are exact
    * while 2|E|·dmax² < 2^63 and m·Σx² stays in range (fine to ~10^5
    * hub degrees on ~10^7-edge graphs); a full web graph switches the
    * three sums and the readout products to DOUBLE (or DECIMAL) in the
    * same plan — the gate keeps integers for bit-exactness, and ANSI
    * mode turns an overflow into a loud error rather than a wrong r. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("lo"), col("hi")).as("lo"),
        greatest(col("lo"), col("hi")).as("hi"))
      .filter(col("lo") < col("hi")).distinct()
    val sym = e.select(col("lo").as("u"), col("hi").as("v"))
      .union(e.select(col("hi").as("u"), col("lo").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
    val xy = sym
      .join(deg.select(col("u"), col("d").as("x")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("d").as("y")), Seq("v"))
    xy.agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"))
      .select(col("m"), col("sx"), col("sxy"), col("sx2"),
        when(col("m") * col("sx2") - col("sx") * col("sx") =!= 0,
          (col("m") * col("sxy") - col("sx") * col("sx")).cast("double") /
            (col("m") * col("sx2") - col("sx") * col("sx")))
          .as("r"))
  }

  /** k-CORE membership by ITERATIVE PEELING (Batagelj-Zaversnik
    * distributed form): repeatedly delete every node whose degree in
    * the SURVIVING graph is < k until nothing changes; the nodes left
    * are exactly the k-core (maximal subgraph with min degree ≥ k) —
    * the graph-density filter crawl/link analysis runs before the
    * expensive centrality passes (PageRank/HITS on the 3-core skips
    * the pendant/chain noise that dominates raw web graphs).
    *
    * Each round is one degree aggregation (shuffle on node) + two
    * semi-join-shaped edge filters — the g02/d08 shuffle classes.
    * Convergence is the g02 protocol exactly: per-round persist, an
    * order-independent (count, bit_xor) checksum as the fixed-point
    * test, a lineage cut so plan depth stays O(1), and a LOUD abort
    * past maxIter. Round count = peel depth: pendant CHAINS peel one
    * layer per round (a length-L path costs O(L) rounds for k=2), so
    * production graphs with deep tendrils raise maxIter consciously —
    * the common web-graph shape (bounded-depth tendrils off a dense
    * core) converges in a handful of rounds.
    *
    * Returns every node of `nodes` with `in_kcore` ∈ {0,1}. */
  def kCore(
      nodes: DataFrame,
      edges: DataFrame,
      k: Int,
      maxIter: Int = 30): DataFrame = {
    val spark = nodes.sparkSession
    var e = edges.filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .distinct()
    var cached = ManagedCache.persist(e)
    e = cached
    var sig = checksum(e)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val keep = sym.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("u"))
      val next0 = e
        .join(keep.select(col("u").as("hi")), Seq("hi"), "left_semi")
        .join(keep.select(col("u").as("lo")), Seq("lo"), "left_semi")
        .select(col("hi"), col("lo"))
      val next = ManagedCache.persist(next0)
      val nextSig = checksum(next) // materializes `next`
      done = nextSig == sig
      sig = nextSig
      cached.unpersist(blocking = false)
      cached = next
      val slim = next.select("hi", "lo")
      e = spark.createDataFrame(slim.rdd, slim.schema)
      iter += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"kCore(k=$k) did not reach a fixed point in $maxIter rounds " +
          "— the graph has a peel chain deeper than maxIter; raise it")
    val idCol = nodes.columns.head
    val core = e.select(col("hi").as(idCol))
      .union(e.select(col("lo").as(idCol))).distinct()
      .withColumn("__in", lit(1))
    nodes.join(core, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__in"), lit(0)).as("in_kcore"))
  }

  /** Order-independent fixed-point check: (count, bit_xor of row
    * hashes) — xor cannot overflow under ANSI mode, unlike a sum. Used
    * only for convergence detection, never for correctness. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(hi, lo))"))
      .collect().head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** All-pairs BFS → CLOSENESS centrality — the shortest-path family
    * (g01–g06 cover ranking/components/motifs/degree but no distances).
    * Level-synchronous frontier expansion: round r joins the depth-r
    * frontier against the symmetrized edge list and anti-joins the
    * visited set, so each (source, node) pair is settled exactly once at
    * its TRUE distance (BFS invariant: first touch is shortest on an
    * unweighted graph). Emits per source: reachable count, total
    * distance, and closeness (n_reached / total_dist — NULL for
    * isolated sources, one double division at readout).
    *
    * Scale: each round is one join + one anti-join over the frontier —
    * the O(diameter)-round protocol of [[ccLargeSmallStar]]/[[kCore]],
    * with the same per-round persist + count materialization and
    * lineage cut. ALL-PAIRS state is O(V²) — this is the
    * analytics-on-a-projected-subgraph form (here: the 30-residue
    * domain graph); single/multi-source BFS over a corpus-sized graph
    * drops the source dimension, same loop. Frontier-still-growing at
    * `maxDepth` aborts loudly rather than returning truncated
    * distances. */
  def bfsCloseness(
      nodes: DataFrame,
      edges: DataFrame,
      maxDepth: Int = 16): DataFrame = {
    val spark = nodes.sparkSession
    val idCol = nodes.columns.head
    val und = ManagedCache.persist(
      edges.filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
        .union(edges.filter(col("src") =!= col("dst"))
          .select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    var all = ManagedCache.persist(
      nodes.select(col(idCol).as("srcn"), col(idCol).as("node"),
        lit(0).as("d")))
    all.count()
    var frontier = all
    var depth = 0
    var growing = true
    while (growing && depth < maxDepth) {
      val nxt0 = frontier.alias("f")
        .join(und.alias("e"), col("f.node") === col("e.src"))
        .select(col("f.srcn").as("srcn"), col("e.dst").as("node"),
          (col("f.d") + 1).as("d"))
        .distinct()
        .join(all.select("srcn", "node"), Seq("srcn", "node"),
          "left_anti")
      val nxt = ManagedCache.persist(nxt0)
      if (nxt.count() == 0) growing = false
      else {
        val merged = ManagedCache.persist(all.unionByName(nxt))
        merged.count()
        all.unpersist(blocking = false)
        // lineage cut: each round's plan must not stack on the last
        all = spark.createDataFrame(merged.rdd, merged.schema)
        frontier = nxt
        depth += 1
      }
    }
    if (growing)
      throw new IllegalStateException(
        s"bfsCloseness: frontier still growing after $maxDepth rounds " +
          "— graph diameter exceeds maxDepth; raise it")
    all.groupBy(col("srcn").as(idCol))
      .agg((count(lit(1)) - 1).as("n_reached"),
        sum(col("d")).cast("long").as("total_dist"))
      .withColumn("closeness",
        when(col("total_dist") > 0,
          col("n_reached").cast("double") / col("total_dist")))
  }

  /** LINK PREDICTION by common-neighbor count + neighborhood Jaccard —
    * the "which domains SHOULD link" primitive behind crawl-frontier
    * expansion and related-source discovery: a non-adjacent pair whose
    * neighborhoods overlap heavily is the top candidate edge. For every
    * non-adjacent pair (a < b) with at least one shared neighbor:
    * cn = |Γ(a) ∩ Γ(b)|, deg_a/deg_b, and
    * jaccard = cn / (deg_a + deg_b − cn) — integer statistics end to
    * end, ONE exact division at readout (the g05 discipline; identical
    * integers render identical doubles on both engines).
    *
    * Plan: the wedge self-join adj(m,a) ⋈ adj(m,b) on the shared
    * MIDDLE vertex m — one shuffle keyed by m, then one pair-keyed
    * aggregation, an anti-join against the edge set (candidates must
    * be non-edges), and two degree joins. Scale: wedge fan-out is
    * Σ_m deg(m)², dominated by hub middles — production caps or
    * samples middles above a degree bound before the self-join (the
    * d03 maxBucket pattern applied to vertices); the cap drops only
    * candidates whose ONLY evidence is a hub, which is exactly the
    * weak-signal tail (everything is a hub's neighbor). */
  def linkPrediction(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("lo"), col("hi")).as("lo"),
        greatest(col("lo"), col("hi")).as("hi"))
      .filter(col("lo") < col("hi")).distinct()
    val adj = e.select(col("lo").as("m"), col("hi").as("x"))
      .union(e.select(col("hi").as("m"), col("lo").as("x")))
    val deg = adj.groupBy(col("m").as("v")).agg(count(lit(1)).as("d"))
    val cn = adj.as("p").join(adj.as("q"),
        col("p.m") === col("q.m") && col("p.x") < col("q.x"))
      .groupBy(col("p.x").as("a"), col("q.x").as("b"))
      .agg(count(lit(1)).as("cn"))
    val cand = cn.join(e,
        cn("a") === e("lo") && cn("b") === e("hi"), "left_anti")
    cand
      .join(deg.select(col("v").as("a"), col("d").as("deg_a")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("deg_b")), Seq("b"))
      .select(col("a"), col("b"), col("cn"), col("deg_a"), col("deg_b"),
        (col("cn").cast("double") /
          (col("deg_a") + col("deg_b") - col("cn"))).as("jaccard"))
  }

  /** k-TRUSS — the triangle-reinforced subgraph: keep exactly the edges
    * that sit in ≥ k−2 triangles WITHIN the surviving edge set, to a
    * fixed point. Where [[kCore]] peels weak NODES, the truss peels
    * weak EDGES, and it is the standard next rung of cohesion: a
    * spam-ring/community detector that a degree filter cannot fake
    * (pendant stars have high degree hubs but zero triangles). The
    * fixed point matters — support counts REFERENCE the surviving set,
    * so removals cascade (a "book" of triangles over a shared spine
    * edge keeps the spine's support high until the page edges peel,
    * THEN the spine collapses a round later); any single-pass support
    * filter gets exactly that shape wrong, which the gated entry's
    * constructed corpus exercises.
    *
    * Per round: the oriented a<b<c triangle enumeration (the g03
    * two-join plan — each triangle found once), exploded back onto its
    * three edges, one groupBy(lo,hi) support count, and a semi-join
    * keep — all edge-keyed shuffles. Convergence by the [[kCore]]
    * protocol: persist + order-independent checksum per round, lineage
    * cut via RDD rebuild, loud abort at maxIter (peel chains deeper
    * than the budget must not return a half-peeled set silently).
    * Scale: round count is the peel depth (graph-diameter-ish, small
    * in practice); each round's cost is the triangle join, bounded by
    * Σ deg(v)^1.5 under degree orientation. Returns every input edge
    * with an `in_truss` 0/1 flag. */
  def kTruss(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    val base0 = edges
      .select(least(col("lo"), col("hi")).as("lo"),
        greatest(col("lo"), col("hi")).as("hi"))
      .filter(col("lo") < col("hi")).distinct()
    val base = ManagedCache.persist(base0)
    var e = base
    var cached = base
    var sig = checksum(e)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val tris = e.as("ab")
        .join(e.as("bc"), col("ab.hi") === col("bc.lo"))
        .join(e.as("ac"), col("ac.lo") === col("ab.lo") &&
          col("ac.hi") === col("bc.hi"))
        .select(col("ab.lo").as("a"), col("ab.hi").as("b"),
          col("bc.hi").as("c"))
      val support = tris
        .select(col("a").as("lo"), col("b").as("hi"))
        .union(tris.select(col("b").as("lo"), col("c").as("hi")))
        .union(tris.select(col("a").as("lo"), col("c").as("hi")))
        .groupBy("lo", "hi").agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= k - 2)
      val next0 = e.join(support.select("lo", "hi"),
        Seq("lo", "hi"), "left_semi")
      val next = ManagedCache.persist(next0)
      val nextSig = checksum(next) // materializes `next`
      done = nextSig == sig
      sig = nextSig
      if (cached ne base) cached.unpersist(blocking = false)
      cached = next
      val slim = next.select("lo", "hi")
      e = spark.createDataFrame(slim.rdd, slim.schema)
      iter += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"kTruss(k=$k) did not reach a fixed point in $maxIter rounds " +
          "— the peel cascade is deeper than maxIter; raise it")
    base
      .join(e.withColumn("__in", lit(1)), Seq("lo", "hi"), "left")
      .select(col("lo"), col("hi"),
        coalesce(col("__in"), lit(0)).as("in_truss"))
  }

  /** MODULARITY of a given partition (Newman's Q) — the quality number
    * community detection optimizes and the check a curation pipeline
    * runs on any clustering it intends to act on (source groups,
    * dedup clusters, topic assignments): how much denser are the
    * communities than a degree-preserving random rewiring. Exact
    * integer form: with m edges, e_c intra-community edges and a_c the
    * community degree sum, Q = Σ_c (4m·e_c − a_c²) / 4m² — every
    * statistic an integer count, ONE exact division at readout (the
    * g01/g05 discipline). Emits per community: intra-edge count,
    * degree sum, the integer contribution numerator, m, and the global
    * Q repeated per row.
    *
    * Plan: degree table (one groupBy), membership join on both edge
    * endpoints (intra filter + per-community count), degree⋈membership
    * rollup, and the global sums as a 1-row broadcast cross join — no
    * single-partition window, no collect. Scale: everything keys on
    * community or vertex ids; the output is one row per community. */
  /** SYNCHRONOUS LABEL PROPAGATION (Raghavan et al. 2007) — community
    * detection by iterated neighbor-majority vote, made DETERMINISTIC:
    * labels start as node ids; each round every node adopts the
    * MINIMUM label among the maximum-frequency labels of its
    * neighbors (classic LPA breaks frequency ties randomly — the min
    * rule is the standard reproducible variant), isolated nodes keep
    * their label. Synchronous (all nodes update from the previous
    * round's labels), so the result is independent of any visit
    * order. Emits one labels column per round — hashing EVERY round's
    * assignment, not just the settled one, puts the
    * argmax-with-tie-break itself under the gate round by round.
    *
    * Scale: each round is one edge-side shuffle (adjacency JOIN labels
    * on the neighbor key, groupBy (node, label) count) plus a
    * per-node window max — the per-round cost of PageRank with the
    * same O(m) partitioning; rounds are a fixed small constant here
    * (LPA converges in a handful of sweeps; synchronous LPA may
    * 2-cycle on bipartite structure, which a fixed round budget
    * sidesteps deterministically). Labels stay (node, label) pairs —
    * never collected, never densified. */
  def labelPropagation(
      nodes: DataFrame, edges: DataFrame, rounds: Int = 2): DataFrame = {
    val adj = edges.select(col("lo").as("v"), col("hi").as("u"))
      .union(edges.select(col("hi").as("v"), col("lo").as("u")))
    val win = org.apache.spark.sql.expressions.Window.partitionBy("v")
    var out = nodes.select(col("v"))
    var labels = nodes.select(col("v"), col("v").as("lab"))
    for (r <- 1 to rounds) {
      val cnt = adj
        .join(labels.select(col("v").as("u"), col("lab")), "u")
        .groupBy("v", "lab").agg(count(lit(1)).as("c"))
      val next = cnt
        .withColumn("mc", max(col("c")).over(win))
        .filter(col("c") === col("mc"))
        .groupBy("v").agg(min(col("lab")).as("lab"))
      labels = nodes.select(col("v"))
        .join(next, Seq("v"), "left")
        .select(col("v"), coalesce(col("lab"), col("v")).as("lab"))
      out = out.join(labels.withColumnRenamed("lab", s"lab$r"), "v")
    }
    out.withColumnRenamed("v", "node")
  }

  def modularity(edges: DataFrame, membership: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("lo"), col("hi")).as("lo"),
        greatest(col("lo"), col("hi")).as("hi"))
      .filter(col("lo") < col("hi")).distinct()
    val mem = membership.select(col("v"), col("c"))
    val deg = e.select(col("lo").as("v"))
      .union(e.select(col("hi").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val tagged = e
      .join(mem.select(col("v").as("lo"), col("c").as("cl")), Seq("lo"))
      .join(mem.select(col("v").as("hi"), col("c").as("ch")), Seq("hi"))
    val intra = tagged.filter(col("cl") === col("ch"))
      .groupBy(col("cl").as("c")).agg(count(lit(1)).as("n_intra"))
    val degSum = deg.join(mem, Seq("v"))
      .groupBy("c").agg(sum(col("d")).as("deg_sum"))
    val m = e.agg(count(lit(1)).as("m_edges"))
    val perC = mem.select(col("c")).distinct()
      .join(intra, Seq("c"), "left")
      .join(degSum, Seq("c"), "left")
      .crossJoin(m)
      .select(col("c").as("community"),
        coalesce(col("n_intra"), lit(0L)).as("n_intra"),
        coalesce(col("deg_sum"), lit(0L)).as("deg_sum"),
        col("m_edges"))
      .withColumn("contrib_num",
        lit(4L) * col("m_edges") * col("n_intra") -
          col("deg_sum") * col("deg_sum"))
    val total = perC.agg(sum(col("contrib_num")).as("q_num"))
    perC.crossJoin(total)
      .select(col("community"), col("n_intra"), col("deg_sum"),
        col("contrib_num"), col("m_edges"),
        (col("q_num").cast("double") /
          (lit(4.0) * col("m_edges") * col("m_edges"))).as("q_total"))
  }

  /** STRONGLY CONNECTED COMPONENTS — the DIRECTED-graph component
    * notion ([[ccLargeSmallStar]] is undirected): u and v share an SCC
    * iff each reaches the other, the structure that finds redirect
    * rings and crawl traps in a link graph where undirected CC just
    * merges everything a hub touches. Here: directed reachability
    * closure by level-synchronous frontier expansion (the
    * [[bfsCloseness]] loop WITHOUT symmetrizing the edges), then
    * mutual-reach pairs via one self-join of the closure against its
    * transpose, then min-label + size per node. Returns (v, scc_rep,
    * scc_size); singletons are their own rep.
    *
    * Scale: the reachability closure is O(V·reach) state — this is
    * the projected-subgraph analytics form (the gated entry runs it
    * on the 50-domain graph). Web-scale SCC replaces the closure with
    * forward-backward pivot partitioning (reach ∩ reach⁻¹ from ONE
    * pivot splits the graph into 4 disjoint parts, recurse) — same
    * frontier-join primitive, avoids all-pairs state. Loud abort if
    * the frontier outlives maxIter, per the house fixed-point rule. */
  def sccLabels(
      nodes: DataFrame,
      edges: DataFrame,
      maxIter: Int = 32): DataFrame = {
    val spark = nodes.sparkSession
    val idCol = nodes.columns.head
    val dir = ManagedCache.persist(
      edges.filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct())
    var all = ManagedCache.persist(
      nodes.select(col(idCol).as("srcn"), col(idCol).as("node")))
    all.count()
    var frontier = all
    var depth = 0
    var growing = true
    while (growing && depth < maxIter) {
      val nxt0 = frontier.alias("f")
        .join(dir.alias("e"), col("f.node") === col("e.src"))
        .select(col("f.srcn").as("srcn"), col("e.dst").as("node"))
        .distinct()
        .join(all, Seq("srcn", "node"), "left_anti")
      val nxt = ManagedCache.persist(nxt0)
      if (nxt.count() == 0) growing = false
      else {
        val merged = ManagedCache.persist(all.unionByName(nxt))
        merged.count()
        all.unpersist(blocking = false)
        all = spark.createDataFrame(merged.rdd, merged.schema)
        frontier = nxt
        depth += 1
      }
    }
    if (growing)
      throw new IllegalStateException(
        s"sccLabels: reachability still growing after $maxIter rounds " +
          "— longest path exceeds the budget; raise maxIter")
    val mutual = all.as("a").join(all.as("b"),
        col("a.srcn") === col("b.node") && col("a.node") === col("b.srcn"))
      .select(col("a.srcn").as("v"), col("a.node").as("w"))
    mutual.groupBy("v")
      .agg(min(col("w")).as("scc_rep"), count(lit(1)).as("scc_size"))
  }
}

object GraphQueries {

  val queries: Seq[Q] = Seq(

    // DOMAIN PAGERANK under the hash gate — see [[Graph.domainPagerank2]]
    // for the exact-integer construction. The graph is CONSTRUCTED from
    // the corpus (domain doc_id%50 links to (doc_id²+1)%50 — t33's
    // constructed-gate pattern applied to edges; squaring varies the
    // indegrees), so the driver gate holds the join→aggregate iteration
    // itself to the oracle's CTE restatement: indegree round,
    // contribution round, and the final exact division all must agree
    // bit-for-bit.
    Q("g01_domain_pagerank",
      (s, d) => Graph.domainPagerank2(Tables.t(s, d, "documents")),
      Some("""WITH nodes AS (SELECT DISTINCT doc_id % 50 AS v
             |FROM documents),
             |edges AS (SELECT DISTINCT doc_id % 50 AS src,
             |(doc_id * doc_id + 1) % 50 AS dst FROM documents),
             |ind AS (SELECT dst, count(*) AS ind FROM edges GROUP BY 1),
             |r1 AS (SELECT v, 3 + 17 * COALESCE(ind, 0) AS n1
             |FROM nodes LEFT JOIN ind ON ind.dst = nodes.v),
             |c AS (SELECT e.dst AS cv, r1.n1 FROM edges e
             |JOIN r1 ON e.src = r1.v),
             |r2 AS (SELECT v,
             |CAST(60 + 17 * COALESCE(sum(n1), 0) AS BIGINT) AS rank_num
             |FROM nodes LEFT JOIN c ON c.cv = nodes.v GROUP BY v)
             |SELECT v AS domain, rank_num,
             |CAST(rank_num AS DOUBLE) / 20000.0 AS rank FROM r2"""
        .stripMargin.replace('\n', ' '))),

    // CONNECTED COMPONENTS (large-star/small-star) under the hash gate —
    // the edge set is a constructed CHAIN per family (doc k links to
    // k−50, so family k%50 is a PATH of length corpus/50), which is
    // exactly the shape that breaks O(diameter) label propagation and
    // that the star algorithm contracts in O(log) rounds; the oracle
    // states the component minimum arithmetically (doc_id % 50). The
    // algorithmic-equivalence evidence (same components as d08's label
    // propagation on a real near-dup pair graph) is in GraphSpec.
    Q("g02_connected_components",
      (s, d) => {
        val docs = Tables.t(s, d, "documents").select(col("doc_id"))
        val edges = docs.filter(col("doc_id") >= 50)
          .select(col("doc_id").as("src"),
            (col("doc_id") - 50).as("dst"))
        Graph.ccLargeSmallStar(docs, edges)
      },
      Some("SELECT doc_id, doc_id % 50 AS rep FROM documents")),

    // TRIANGLE COUNTING / CLUSTERING COEFFICIENT under the hash gate —
    // the edge set is CONSTRUCTED from the corpus with three residue
    // generators (quadratic chord + two linear rings over 30 domains:
    // 83 distinct edges, 28 triangles at any corpus covering the
    // residues), so both engines derive the identical graph and the gate
    // holds the oriented a<b<c enumeration, the 3-way per-node rollup,
    // and the exact 2T/deg(deg−1) division bit-for-bit. See
    // [[Graph.triangleStats]] for the degree-orientation scale note.
    Q("g03_triangle_count",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val a = (col("doc_id") % 30).as("a")
        def gen(b: org.apache.spark.sql.Column) =
          docs.select(a, (b % 30).as("b"))
        val raw = gen((col("doc_id") % 30) * (col("doc_id") % 30) + 1)
          .union(gen(col("doc_id") + 2))
          .union(gen(col("doc_id") * 3 + 5))
        val edges = raw.filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("lo"),
            greatest(col("a"), col("b")).as("hi"))
          .distinct()
        Graph.triangleStats(
          docs.select((col("doc_id") % 30).as("v")).distinct(), edges)
      },
      Some("""WITH nodes AS (SELECT DISTINCT doc_id % 30 AS v
             |FROM documents),
             |raw AS (SELECT doc_id % 30 AS a, (doc_id*doc_id+1) % 30 AS b
             |FROM documents
             |UNION ALL SELECT doc_id % 30, (doc_id+2) % 30 FROM documents
             |UNION ALL SELECT doc_id % 30, (doc_id*3+5) % 30 FROM documents),
             |e AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
             |FROM raw WHERE a != b),
             |deg AS (SELECT v, count(*) AS degree FROM
             |(SELECT lo AS v FROM e UNION ALL SELECT hi FROM e) GROUP BY v),
             |tri AS (SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
             |FROM e ab JOIN e bc ON ab.hi = bc.lo
             |JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
             |pn AS (SELECT v, count(*) AS n_triangles FROM
             |(SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
             |UNION ALL SELECT c FROM tri) GROUP BY v)
             |SELECT n.v AS node, COALESCE(deg.degree, 0) AS degree,
             |COALESCE(pn.n_triangles, 0) AS n_triangles,
             |CASE WHEN COALESCE(deg.degree, 0) >= 2
             |THEN CAST(2 * COALESCE(pn.n_triangles, 0) AS DOUBLE)
             |/ (deg.degree * (deg.degree - 1)) ELSE 0.0 END AS clustering
             |FROM nodes n LEFT JOIN deg ON deg.v = n.v
             |LEFT JOIN pn ON pn.v = n.v"""
        .stripMargin.replace('\n', ' '))),

    // HITS HUB/AUTHORITY under the hash gate — g01's constructed domain
    // graph, the mutually-recursive centrality in exact integers (see
    // [[Graph.hits2]]); the oracle restates both half-step joins and the
    // final three-column readout. Distinguishes good POINTERS from good
    // TARGETS where PageRank only ranks targets.
    Q("g04_hits",
      (s, d) => Graph.hits2(Tables.t(s, d, "documents")),
      Some("""WITH nodes AS (SELECT DISTINCT doc_id % 50 AS v
             |FROM documents),
             |edges AS (SELECT DISTINCT doc_id % 50 AS src,
             |(doc_id * doc_id + 1) % 50 AS dst FROM documents),
             |a1 AS (SELECT n.v, COALESCE(i.ind, 0) AS a1 FROM nodes n
             |LEFT JOIN (SELECT dst, count(*) AS ind FROM edges
             |GROUP BY 1) i ON i.dst = n.v),
             |h1 AS (SELECT n.v, COALESCE(hs.hs, 0) AS h1 FROM nodes n
             |LEFT JOIN (SELECT e.src, CAST(sum(a1.a1) AS BIGINT) AS hs
             |FROM edges e JOIN a1 ON a1.v = e.dst GROUP BY 1) hs
             |ON hs.src = n.v),
             |a2 AS (SELECT n.v, COALESCE(s2.as2, 0) AS a2 FROM nodes n
             |LEFT JOIN (SELECT e.dst, CAST(sum(h1.h1) AS BIGINT) AS as2
             |FROM edges e JOIN h1 ON h1.v = e.src GROUP BY 1) s2
             |ON s2.dst = n.v)
             |SELECT a1.v AS domain, a1.a1 AS auth1, h1.h1 AS hub1,
             |a2.a2 AS auth2 FROM a1 JOIN h1 ON h1.v = a1.v
             |JOIN a2 ON a2.v = a1.v"""
        .stripMargin.replace('\n', ' '))),

    // DEGREE ASSORTATIVITY under the hash gate — g03's constructed
    // 30-domain graph through [[Graph.degreeAssortativity]]; the oracle
    // restates the symmetric endpoint expansion, the four integer
    // sufficient statistics, and the one exact division.
    Q("g05_assortativity",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val a = (col("doc_id") % 30).as("a")
        def gen(b: org.apache.spark.sql.Column) =
          docs.select(a, (b % 30).as("b"))
        val raw = gen((col("doc_id") % 30) * (col("doc_id") % 30) + 1)
          .union(gen(col("doc_id") + 2))
          .union(gen(col("doc_id") * 3 + 5))
        Graph.degreeAssortativity(
          raw.filter(col("a") =!= col("b"))
            .select(col("a").as("lo"), col("b").as("hi")))
      },
      Some("""WITH raw AS (SELECT doc_id % 30 AS a,
             |(doc_id*doc_id+1) % 30 AS b FROM documents
             |UNION ALL SELECT doc_id % 30, (doc_id+2) % 30 FROM documents
             |UNION ALL SELECT doc_id % 30, (doc_id*3+5) % 30
             |FROM documents),
             |e AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
             |FROM raw WHERE a != b),
             |sym AS (SELECT lo AS u, hi AS v FROM e
             |UNION ALL SELECT hi, lo FROM e),
             |deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
             |xy AS (SELECT dx.d AS x, dy.d AS y FROM sym
             |JOIN deg dx ON dx.u = sym.u JOIN deg dy ON dy.u = sym.v),
             |st AS (SELECT count(*) AS m, CAST(sum(x) AS BIGINT) AS sx,
             |CAST(sum(x * y) AS BIGINT) AS sxy,
             |CAST(sum(x * x) AS BIGINT) AS sx2 FROM xy)
             |SELECT m, sx, sxy, sx2,
             |CASE WHEN m * sx2 - sx * sx != 0
             |THEN CAST(m * sxy - sx * sx AS DOUBLE) / (m * sx2 - sx * sx)
             |END AS r FROM st"""
        .stripMargin.replace('\n', ' '))),

    // k-CORE under the hash gate — see [[Graph.kCore]]. The graph is
    // CONSTRUCTED so the core membership is arithmetically statable
    // (the g01/g02 gate rule): docs split into groups of 10, the first
    // 2+(group%5) members of each group form a CLIQUE, the rest hang
    // off member 0 as PENDANTS. A node is in the 3-core iff it sits in
    // a clique of size ≥ 4 (pendants peel round 1, 2-cliques and
    // triangles peel next, member 0's pendant-inflated degree
    // collapses once its leaves vanish — the construction exercises
    // exactly the multi-round cascade that makes single-pass degree
    // filtering WRONG). The oracle states membership from the
    // construction; the Spark side must peel its way to the same
    // answer through the iterative fixed point.
    Q("g06_kcore",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val m = docs.select(col("doc_id"),
          (col("doc_id") / 10).cast("long").as("g"),
          (col("doc_id") % 10).as("idx"))
          .withColumn("cs", lit(2) + pmod(col("g"), lit(5)))
        val members = m.filter(col("idx") < col("cs"))
        val clique = members.as("a").join(members.as("b"),
            col("a.g") === col("b.g") && col("a.idx") < col("b.idx"))
          .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
        // anchor g*10 = the decade's idx-0 member. DENSE-ID FIXTURE
        // ASSUMPTION (shared with g10/g11, ADVICE r12): the testdata's
        // doc_ids are contiguous per block — the fixture generator emits
        // 0..N-1 and ScaleUp strides by 1e9 (10-aligned), so every
        // decade that contains any member contains its anchor. A gapped
        // corpus would need min(doc_id) per g as the anchor on BOTH
        // engine and oracle sides; the closed-form membership oracle
        // below is only valid under this density assumption.
        val pendant = m.filter(col("idx") >= col("cs"))
          .select((col("g") * 10).as("src"), col("doc_id").as("dst"))
        Graph.kCore(docs.select(col("doc_id")),
          clique.union(pendant), k = 3)
      },
      Some("""WITH n AS (SELECT doc_id, doc_id // 10 AS g,
             |doc_id % 10 AS idx FROM documents),
             |c AS (SELECT doc_id, idx, 2 + (g % 5) AS cs FROM n)
             |SELECT doc_id,
             |CAST(CASE WHEN idx < cs AND cs >= 4 THEN 1 ELSE 0 END
             |AS INTEGER) AS in_kcore FROM c"""
        .stripMargin.replace('\n', ' '))),

    // PERSONALIZED PAGERANK under the hash gate — see [[Graph
    // .domainPpr2]]. Same constructed functional graph as g01; seeds =
    // domains 0–9. The oracle replays the two integer-numerator rounds
    // as CTEs; ppr_num is exact cross-engine and ppr is ONE division of
    // identical integers. A non-seed domain with no seed-reachable
    // in-path must read 0 — teleport locality, the property global PR
    // (g01) cannot express.
    Q("g08_domain_ppr",
      (s, d) => Graph.domainPpr2(Tables.t(s, d, "documents")),
      Some("""WITH nodes AS (SELECT DISTINCT doc_id % 50 AS v
             |FROM documents),
             |e AS (SELECT DISTINCT doc_id % 50 AS src,
             |(doc_id * doc_id + 1) % 50 AS dst FROM documents),
             |sd AS (SELECT v, CASE WHEN v < 10 THEN 1 ELSE 0 END AS s
             |FROM nodes),
             |c0 AS (SELECT e.dst, CAST(sum(sd.s) AS BIGINT) AS c
             |FROM e JOIN sd ON e.src = sd.v GROUP BY e.dst),
             |n1 AS (SELECT sd.v, sd.s,
             |3 * sd.s + 17 * COALESCE(c0.c, 0) AS nv
             |FROM sd LEFT JOIN c0 ON sd.v = c0.dst),
             |c1 AS (SELECT e.dst, CAST(sum(n1.nv) AS BIGINT) AS c
             |FROM e JOIN n1 ON e.src = n1.v GROUP BY e.dst),
             |n2 AS (SELECT sd.v, 60 * sd.s + 17 * COALESCE(c1.c, 0)
             |AS nv FROM sd LEFT JOIN c1 ON sd.v = c1.dst),
             |k AS (SELECT CAST(sum(s) AS BIGINT) AS n_seeds FROM sd)
             |SELECT n2.v AS domain, CAST(n2.nv AS BIGINT) AS ppr_num,
             |CAST(n2.nv AS DOUBLE) / (CAST(k.n_seeds AS DOUBLE) * 400.0)
             |AS ppr FROM n2 CROSS JOIN k"""
        .stripMargin.replace('\n', ' '))),

    // BFS CLOSENESS under the hash gate — see [[Graph.bfsCloseness]].
    // Graph: the 30-residue ring + 7-chord circulant (connected,
    // diameter ~4), constructed identically on both engines. The
    // oracle's recursive CTE enumerates bounded walks (d < 10 >
    // diameter) and takes min(d) per pair — the SAME distances BFS
    // settles by first touch, so reach counts, total distances, and the
    // one closeness division must agree exactly. Spark must actually
    // ITERATE to the answer (4 frontier rounds, loud abort beyond 16).
    Q("g07_bfs_closeness",
      (s, d) => {
        val nodes = Tables.t(s, d, "documents")
          .select((col("doc_id") % 30).as("id")).distinct()
        val edges = nodes
          .select(col("id").as("src"), ((col("id") + 1) % 30).as("dst"))
          .unionByName(nodes.select(col("id").as("src"),
            ((col("id") + 7) % 30).as("dst")))
        Graph.bfsCloseness(nodes, edges)
      },
      Some("""WITH RECURSIVE n AS (SELECT DISTINCT doc_id % 30 AS id
             |FROM documents),
             |e0 AS (SELECT id AS src, (id + 1) % 30 AS dst FROM n
             |UNION SELECT id, (id + 7) % 30 FROM n),
             |e AS (SELECT src, dst FROM e0 WHERE src <> dst
             |UNION SELECT dst, src FROM e0 WHERE src <> dst),
             |walk(src, node, d) AS (
             |SELECT id, id, 0 FROM n
             |UNION
             |SELECT w.src, e.dst, w.d + 1 FROM walk w
             |JOIN e ON w.node = e.src WHERE w.d < 10),
             |sp AS (SELECT src, node, min(d) AS d FROM walk
             |GROUP BY 1, 2)
             |SELECT src AS id, CAST(count(*) - 1 AS BIGINT) AS n_reached,
             |CAST(sum(d) AS BIGINT) AS total_dist,
             |CASE WHEN sum(d) > 0 THEN
             |CAST(count(*) - 1 AS DOUBLE) / sum(d) END AS closeness
             |FROM sp GROUP BY src"""
        .stripMargin.replace('\n', ' '))),

    // LINK PREDICTION under the hash gate — see [[Graph
    // .linkPrediction]]. Graph: g03's constructed 30-domain graph
    // (three residue generators), so both engines derive identical
    // edges and the gate holds the wedge self-join, the non-edge
    // anti-join, the degree joins, and the one exact Jaccard division
    // bit-for-bit. Every candidate is a NON-edge with >= 1 shared
    // neighbor — the frontier-expansion shortlist.
    Q("g09_link_prediction",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val a = (col("doc_id") % 30).as("a")
        def gen(b: org.apache.spark.sql.Column) =
          docs.select(a, (b % 30).as("b"))
        val raw = gen((col("doc_id") % 30) * (col("doc_id") % 30) + 1)
          .union(gen(col("doc_id") + 2))
          .union(gen(col("doc_id") * 3 + 5))
        Graph.linkPrediction(
          raw.filter(col("a") =!= col("b"))
            .select(col("a").as("lo"), col("b").as("hi")))
      },
      Some("""WITH raw AS (SELECT doc_id % 30 AS a,
             |(doc_id*doc_id+1) % 30 AS b FROM documents
             |UNION ALL SELECT doc_id % 30, (doc_id+2) % 30 FROM documents
             |UNION ALL SELECT doc_id % 30, (doc_id*3+5) % 30
             |FROM documents),
             |e AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
             |FROM raw WHERE a != b),
             |adj AS (SELECT lo AS m, hi AS x FROM e
             |UNION ALL SELECT hi, lo FROM e),
             |deg AS (SELECT m AS v, count(*) AS d FROM adj GROUP BY 1),
             |cn AS (SELECT p.x AS a, q.x AS b, count(*) AS cn
             |FROM adj p JOIN adj q ON p.m = q.m AND p.x < q.x
             |GROUP BY 1, 2),
             |cand AS (SELECT cn.a, cn.b, cn.cn FROM cn
             |LEFT JOIN e ON e.lo = cn.a AND e.hi = cn.b
             |WHERE e.lo IS NULL)
             |SELECT c.a, c.b, CAST(c.cn AS BIGINT) AS cn,
             |CAST(da.d AS BIGINT) AS deg_a, CAST(db.d AS BIGINT) AS deg_b,
             |CAST(c.cn AS DOUBLE) / (da.d + db.d - c.cn) AS jaccard
             |FROM cand c JOIN deg da ON da.v = c.a
             |JOIN deg db ON db.v = c.b"""
        .stripMargin.replace('\n', ' '))),

    // 4-TRUSS under the hash gate — see [[Graph.kTruss]]. The corpus
    // constructs, per group of 10 docs, a clique of size cs = 2+(g%5)
    // among the first cs members PLUS a "book": every remaining member
    // p joins to members 0 and 1, adding triangle (m0, m1, p). The
    // book is the cascade trap: the spine edge (m0, m1) starts with
    // support (cs−2) + #pendants >= 2 in EVERY group, so a single-pass
    // support filter keeps it everywhere — but the page edges (support
    // exactly 1) peel in round 1, and for cs < 4 the spine then
    // collapses in round 2. The fixed point the oracle states: exactly
    // the clique edges of groups with cs >= 4 survive. The Spark side
    // must actually cascade its way there through the iterative peel.
    Q("g10_ktruss",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val m = docs.select(col("doc_id"),
          (col("doc_id") / 10).cast("long").as("g"),
          (col("doc_id") % 10).as("idx"))
          .withColumn("cs", lit(2) + pmod(col("g"), lit(5)))
        val members = m.filter(col("idx") < col("cs"))
        val clique = members.as("a").join(members.as("b"),
            col("a.g") === col("b.g") && col("a.idx") < col("b.idx"))
          .select(col("a.doc_id").as("lo"), col("b.doc_id").as("hi"))
        val pend = m.filter(col("idx") >= col("cs"))
        // g*10 / g*10+1 book anchors: dense-id fixture assumption —
        // see the g06 pendant construction's note
        val book = pend
          .select((col("g") * 10).as("lo"), col("doc_id").as("hi"))
          .union(pend.select((col("g") * 10 + 1).as("lo"),
            col("doc_id").as("hi")))
        Graph.kTruss(clique.union(book), k = 4)
      },
      Some("""WITH n AS (SELECT doc_id, doc_id // 10 AS g,
             |doc_id % 10 AS idx FROM documents),
             |c AS (SELECT doc_id, g, idx, 2 + (g % 5) AS cs FROM n),
             |edges AS (
             |SELECT a.doc_id AS lo, b.doc_id AS hi,
             |CASE WHEN a.cs >= 4 THEN 1 ELSE 0 END AS t
             |FROM c a JOIN c b ON a.g = b.g AND a.idx < b.idx
             |AND a.idx < a.cs AND b.idx < b.cs
             |UNION ALL SELECT p.g * 10, p.doc_id, 0 FROM c p
             |WHERE p.idx >= p.cs
             |UNION ALL SELECT p.g * 10 + 1, p.doc_id, 0 FROM c p
             |WHERE p.idx >= p.cs)
             |SELECT lo, hi, CAST(t AS INTEGER) AS in_truss FROM edges"""
        .stripMargin.replace('\n', ' '))),

    // MODULARITY under the hash gate — see [[Graph.modularity]]. The
    // corpus constructs g06's clique+pendant groups PLUS a hub ring
    // across groups (member 0 of group g links to member 0 of group
    // (g+1) % 50), communities = the groups, so every statistic is
    // arithmetically statable: e_c = cs(cs−1)/2 + (10−cs) intra edges,
    // a_c = 2e_c + 2 (each hub carries exactly 2 ring edges), m =
    // Σe_c + 50. The Spark side must COMPUTE its way there through
    // the generic membership-join operator; the oracle restates the
    // closed form, so a miscounted degree or a ring edge classified
    // intra flips the hash.
    Q("g11_modularity",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val mfr = docs.select(col("doc_id"),
          (col("doc_id") / 10).cast("long").as("g"),
          (col("doc_id") % 10).as("idx"))
          .withColumn("cs", lit(2) + pmod(col("g"), lit(5)))
        val members = mfr.filter(col("idx") < col("cs"))
        val clique = members.as("a").join(members.as("b"),
            col("a.g") === col("b.g") && col("a.idx") < col("b.idx"))
          .select(col("a.doc_id").as("lo"), col("b.doc_id").as("hi"))
        // g*10 anchors: dense-id fixture assumption — see the g06
        // pendant construction's note
        val pendant = mfr.filter(col("idx") >= col("cs"))
          .select((col("g") * 10).as("lo"), col("doc_id").as("hi"))
        val ring = mfr.select(col("g")).distinct()
          .select((col("g") * 10).as("lo"),
            (pmod(col("g") + 1, lit(50)) * 10).as("hi"))
        Graph.modularity(clique.union(pendant).union(ring),
          mfr.select(col("doc_id").as("v"), col("g").as("c")))
      },
      Some("""WITH gs AS (SELECT DISTINCT doc_id // 10 AS g
             |FROM documents),
             |c AS (SELECT g, 2 + (g % 5) AS cs FROM gs),
             |e AS (SELECT g, cs*(cs-1)//2 + (10-cs) AS ec FROM c),
             |m AS (SELECT CAST(sum(ec) + count(*) AS BIGINT) AS m_edges
             |FROM e),
             |o AS (SELECT e.g AS community, CAST(ec AS BIGINT)
             |AS n_intra, CAST(2*ec + 2 AS BIGINT) AS deg_sum,
             |CAST(4*m.m_edges*ec - (2*ec+2)*(2*ec+2) AS BIGINT)
             |AS contrib_num, m.m_edges FROM e CROSS JOIN m),
             |t AS (SELECT CAST(sum(contrib_num) AS BIGINT) AS q_num
             |FROM o)
             |SELECT community, n_intra, deg_sum, contrib_num, m_edges,
             |CAST(t.q_num AS DOUBLE) / (4.0 * m_edges * m_edges)
             |AS q_total FROM o CROSS JOIN t"""
        .stripMargin.replace('\n', ' '))),

    // STRONGLY CONNECTED COMPONENTS under the hash gate — see [[Graph
    // .sccLabels]]. Graph: g01's DIRECTED functional map v → (v²+1) %
    // 50, whose SCC structure is one 6-cycle {1,2,5,26,27,30} plus 44
    // singletons — small enough for the oracle to COMPUTE (recursive-
    // CTE reachability closure, then mutual-reach grouping, the same
    // algebra the Spark side iterates to), so the gate checks the
    // algorithm against an independent derivation, not a restated
    // constant. Undirected CC (g02) on this graph would glue the
    // tails onto the cycle — the directed/undirected distinction IS
    // the tested semantic.
    Q("g12_scc",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val nodes = docs.select((col("doc_id") % 50).as("v")).distinct()
        val edges = docs.select((col("doc_id") % 50).as("src"),
          (((col("doc_id") % 50) * (col("doc_id") % 50) + 1) % 50)
            .as("dst")).distinct()
        Graph.sccLabels(nodes, edges)
      },
      Some("""WITH RECURSIVE n AS (SELECT DISTINCT doc_id % 50 AS v
             |FROM documents),
             |e AS (SELECT DISTINCT doc_id % 50 AS src,
             |(doc_id * doc_id + 1) % 50 AS dst FROM documents
             |WHERE doc_id % 50 != (doc_id * doc_id + 1) % 50),
             |walk(src, node) AS (
             |SELECT v, v FROM n
             |UNION
             |SELECT w.src, e.dst FROM walk w JOIN e ON w.node = e.src),
             |m AS (SELECT a.src AS u, a.node AS v FROM walk a
             |JOIN walk b ON a.src = b.node AND a.node = b.src)
             |SELECT u AS v, CAST(min(v) AS BIGINT) AS scc_rep,
             |CAST(count(*) AS BIGINT) AS scc_size FROM m GROUP BY u"""
        .stripMargin.replace('\n', ' '))),

    // LABEL PROPAGATION COMMUNITIES under the hash gate — g03's
    // constructed 30-node undirected graph through
    // [[Graph.labelPropagation]]: two synchronous min-tie-break
    // majority-vote rounds, the oracle unrolling both (round 1's
    // all-ones counts reduce to min-neighbor; round 2 exercises real
    // multiplicities and frequency ties). Both rounds' assignments are
    // hashed, so the argmax-with-tie-break is gated per round.
    Q("g13_label_propagation",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val a = (col("doc_id") % 30).as("a")
        def gen(b: org.apache.spark.sql.Column) =
          docs.select(a, (b % 30).as("b"))
        val raw = gen((col("doc_id") % 30) * (col("doc_id") % 30) + 1)
          .union(gen(col("doc_id") + 2))
          .union(gen(col("doc_id") * 3 + 5))
        val edges = raw.filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("lo"),
            greatest(col("a"), col("b")).as("hi"))
          .distinct()
        Graph.labelPropagation(
          docs.select((col("doc_id") % 30).as("v")).distinct(), edges)
      },
      Some("""WITH nodes AS (SELECT DISTINCT doc_id % 30 AS v
             |FROM documents),
             |raw AS (SELECT doc_id % 30 AS a, (doc_id*doc_id+1) % 30 AS b
             |FROM documents
             |UNION ALL SELECT doc_id % 30, (doc_id+2) % 30 FROM documents
             |UNION ALL SELECT doc_id % 30, (doc_id*3+5) % 30 FROM documents),
             |e AS (SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi
             |FROM raw WHERE a != b),
             |adj AS (SELECT lo AS v, hi AS u FROM e
             |UNION ALL SELECT hi, lo FROM e),
             |c1 AS (SELECT v, u AS nl, count(*) AS c FROM adj
             |GROUP BY 1, 2),
             |w1 AS (SELECT v, nl, c, max(c) OVER (PARTITION BY v) AS mc
             |FROM c1),
             |l1 AS (SELECT v, min(nl) AS lab FROM w1 WHERE c = mc
             |GROUP BY v),
             |lab1 AS (SELECT n.v, COALESCE(l1.lab, n.v) AS lab
             |FROM nodes n LEFT JOIN l1 ON l1.v = n.v),
             |c2 AS (SELECT a.v, b.lab AS nl, count(*) AS c FROM adj a
             |JOIN lab1 b ON b.v = a.u GROUP BY 1, 2),
             |w2 AS (SELECT v, nl, c, max(c) OVER (PARTITION BY v) AS mc
             |FROM c2),
             |l2 AS (SELECT v, min(nl) AS lab FROM w2 WHERE c = mc
             |GROUP BY v),
             |lab2 AS (SELECT n.v, COALESCE(l2.lab, n.v) AS lab
             |FROM nodes n LEFT JOIN l2 ON l2.v = n.v)
             |SELECT n.v AS node, lab1.lab AS lab1, lab2.lab AS lab2
             |FROM nodes n JOIN lab1 ON lab1.v = n.v
             |JOIN lab2 ON lab2.v = n.v"""
        .stripMargin.replace('\n', ' ')),
      bench = true),

    // BIPARTITE PROJECTION with a HUB FANOUT CAP (g14) — the
    // co-engagement graph build (items sharing visitors), which at
    // scale dies on exactly one thing: a hub visitor with f items
    // emits f(f-1)/2 pairs, so the projection self-join is quadratic
    // in the hottest key. The production fix is the d03 corpus-cap
    // discipline applied per visitor: keep at most c=20 items per
    // visitor by a DETERMINISTIC content rank (md5(u:i), id
    // tie-break; c=10 here), bounding every visitor's pair emission
    // at c(c-1)/2 before the join. Degrees and the Jaccard are
    // computed on the SAME capped basis, so the whole capped
    // projection -- rank, cap, self-join, degree join, integer
    // division -- sits under one hash. The fixture fires both arms
    // (most visitors exceed the cap, rare ones don't). Scale: one
    // (visitor) window + one self-join shuffle on u; pair output is
    // corpus-bounded by the cap, never by the hub.
    Q("g14_bipartite_projection",
      (s, d) => {
        val be = Tables.t(s, d, "events")
          .select((col("event_id") % 50).as("u"),
            (col("user_id") % 30).as("i")).distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("u")
          .orderBy(md5(concat_ws(":", col("u"), col("i"))), col("i"))
        val capped = be.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10).drop("rk")
        val deg = capped.groupBy("i").agg(count(lit(1)).as("d"))
        val pairs = capped.as("a")
          .join(capped.as("b"),
            col("a.u") === col("b.u") && col("a.i") < col("b.i"))
          .groupBy(col("a.i").as("i"), col("b.i").as("j"))
          .agg(count(lit(1)).as("n_shared"))
        pairs
          .join(deg.select(col("i"), col("d").as("d_i")), "i")
          .join(deg.select(col("i").as("j"), col("d").as("d_j")), "j")
          .withColumn("jac_bp", expr(
            "(10000 * n_shared) DIV (d_i + d_j - n_shared)"))
          .select("i", "j", "n_shared", "d_i", "d_j", "jac_bp")
      },
      Some("""WITH be AS (SELECT DISTINCT event_id % 50 AS u,
             |user_id % 30 AS i FROM events),
             |rk AS (SELECT u, i, row_number() OVER (PARTITION BY u
             |ORDER BY md5(CAST(u AS VARCHAR) || ':' ||
             |CAST(i AS VARCHAR)), i) AS rk FROM be),
             |cp AS (SELECT u, i FROM rk WHERE rk <= 10),
             |deg AS (SELECT i, count(*) AS d FROM cp GROUP BY i),
             |pr AS (SELECT a.i AS i, b.i AS j, count(*) AS n_shared
             |FROM cp a JOIN cp b ON a.u = b.u AND a.i < b.i
             |GROUP BY 1, 2)
             |SELECT pr.i, pr.j, n_shared, di.d AS d_i, dj.d AS d_j,
             |CAST((10000 * n_shared) // (di.d + dj.d - n_shared)
             |AS BIGINT) AS jac_bp
             |FROM pr JOIN deg di ON di.i = pr.i
             |JOIN deg dj ON dj.i = pr.j"""
        .stripMargin.replace('\n', ' ')))
  )
}
