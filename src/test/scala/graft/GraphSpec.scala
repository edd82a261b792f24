package graft

import org.apache.spark.sql.functions.col

/** Exactness of the integer-numerator PageRank construction. */
class GraphSpec extends SparkSpec {

  test("domain pagerank: two exact iterations match hand-computed " +
    "numerators on a 5-node functional graph (including a node fed by " +
    "an upstream high-rank node, and contributions leaving the node set)") {
    val sq = spark; import sq.implicits._
    // nodes {0..4}; edges u -> (u^2+1)%50: 0->1, 1->2, 2->5, 3->10,
    // 4->17 — dsts 5/10/17 are outside the node set, so their mass
    // drops (defined semantics); indeg(1)=indeg(2)=1.
    // N1 = 3 + 17*indeg: [3, 20, 20, 3, 3]
    // N2(v) = 60 + 17 * sum of incoming N1:
    //   v1 <- N1(0)=3  -> 111;  v2 <- N1(1)=20 -> 400;  others 60.
    val docs = (0L to 4L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = Graph.domainPagerank2(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 60L, 0.003), (1L, 111L, 0.00555), (2L, 400L, 0.02),
      (3L, 60L, 0.003), (4L, 60L, 0.003)), got.toSeq.toString)
  }

  test("large-star/small-star contracts a 100-node path to its minimum " +
    "(the O(diameter)-round label-propagation killer) and keeps " +
    "singletons as their own rep") {
    val sq = spark; import sq.implicits._
    val nodes = (0L to 105L).map(Tuple1(_)).toDF("doc_id")
    // path 0-1-2-...-100; 101..105 isolated
    val edges = (1L to 100L).map(i => (i, i - 1)).toDF("src", "dst")
    val got = Graph.ccLargeSmallStar(nodes, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L to 100L).foreach(i => assert(got(i) == 0L, s"node $i"))
    (101L to 105L).foreach(i => assert(got(i) == i, s"singleton $i"))
  }

  test("large-star/small-star finds the same components as d08's " +
    "min-label propagation on a real near-dup pair graph") {
    val docs = Tables.t(spark, sf, "documents").limit(200).cache()
    val pairs = Dedup.minhashNearDupPairs(docs, 3, 16, 4, 0.5)
      .select("a", "b").cache()
    val viaLabels = Dedup.duplicateClusters(
        pairs, docs.select("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaStars = Graph.ccLargeSmallStar(docs.select("doc_id"),
        pairs.select(col("a").as("src"), col("b").as("dst"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaStars == viaLabels)
  }

  test("triangle stats: hand-computed 4-clique + pendant (per-node " +
    "counts, exact clustering coefficients, isolated node zeros)") {
    val sq = spark; import sq.implicits._
    // clique {1,2,3,4}, pendant 5 on 1, isolated 6
    val nodes = (1L to 6L).map(Tuple1(_)).toDF("v")
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("lo", "hi")
    val got = Graph.triangleStats(nodes, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 4L, 3L, 0.5), (2L, 3L, 3L, 1.0), (3L, 3L, 3L, 1.0),
      (4L, 3L, 3L, 1.0), (5L, 1L, 0L, 0.0), (6L, 0L, 0L, 0.0)),
      got.toSeq.toString)
  }

  test("HITS: hand-computed two half-steps on the 5-node functional " +
    "graph (contributions leaving the node set drop, hub of a dangling " +
    "target is 0)") {
    val sq = spark; import sq.implicits._
    // edges u -> (u^2+1)%50: 0->1, 1->2, 2->5, 3->10, 4->17; dsts
    // 5/10/17 outside the node set.
    // a1 = indeg: [0,1,1,0,0]
    // h1(u) = a1(dst(u)) when dst in set else 0: [1,1,0,0,0]
    // a2(v) = sum h1 over in-edges: v1 <- h1(0)=1; v2 <- h1(1)=1
    val docs = (0L to 4L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = Graph.hits2(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 0L, 1L, 0L), (1L, 1L, 1L, 1L), (2L, 1L, 0L, 1L),
      (3L, 0L, 0L, 0L), (4L, 0L, 0L, 0L)), got.toSeq.toString)
  }

  test("assortativity: a star is exactly -1 (perfectly disassortative), " +
    "a regular graph is undefined (NULL r)") {
    val sq = spark; import sq.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("lo", "hi")
    val s = Graph.degreeAssortativity(star).collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3),
      s.getDouble(4)) == ((6L, 12L, 18L, 30L, -1.0)), s.toString)
    val triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("lo", "hi")
    val t = Graph.degreeAssortativity(triangle).collect().head
    assert(t.isNullAt(4), "regular graph must read NULL, not 0/0")
  }

  test("triangle stats: reversed/duplicate input edges do not change " +
    "the answer (the lo<hi distinct normalization owns orientation)") {
    val sq = spark; import sq.implicits._
    val nodes = (1L to 3L).map(Tuple1(_)).toDF("v")
    val canonical = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("lo", "hi")
    // duplicates, a genuinely REVERSED pair (3,1), and a self-loop
    val messy = Seq((1L, 2L), (1L, 2L), (3L, 1L), (2L, 3L), (3L, 2L),
      (2L, 2L)).toDF("lo", "hi")
    val a = Graph.triangleStats(nodes, canonical).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Graph.triangleStats(nodes, messy).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L)))
  }

  test("kCore peels multi-round cascades (pendants, then orphaned " +
    "survivors), keeps exactly the k-core, and aborts loudly past " +
    "maxIter") {
    val sq = spark; import sq.implicits._
    // 4-clique {1,2,3,4} with pendants 8,9 off node 1; triangle
    // {5,6,7}; path 10-11-12-13. 3-core = the clique alone; 2-core
    // adds the triangle; the path dies from BOTH ends one layer per
    // round — the cascade single-pass degree filtering gets wrong.
    val nodes = (1L to 13L).toDF("node")
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L),
      (1L, 8L), (1L, 9L),
      (10L, 11L), (11L, 12L), (12L, 13L)).toDF("src", "dst")
    def run(k: Int) = Graph.kCore(nodes, edges, k).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val k3 = run(3)
    assert((1L to 4L).forall(k3(_) == 1), k3.toString)
    assert((5L to 13L).forall(k3(_) == 0), k3.toString)
    val k2 = run(2)
    assert((1L to 7L).forall(k2(_) == 1), k2.toString)
    assert((8L to 13L).forall(k2(_) == 0), k2.toString)
    // non-convergence must be loud, never a silently-partial core
    val e = intercept[IllegalStateException] {
      Graph.kCore(nodes, edges, 2, maxIter = 1)
    }
    assert(e.getMessage.contains("fixed point"))
  }

  test("bfsCloseness on a hand-computed path graph: 0-1-2-3 gives " +
    "distances (1+2+3, 1+1+2, ...) and an isolated node reads NULL " +
    "closeness; too-small maxDepth aborts loudly") {
    val sq = spark; import sq.implicits._
    val nodes = Seq(0L, 1L, 2L, 3L, 9L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.bfsCloseness(nodes, edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(0L) == ((3L, 6L, Some(3.0 / 6))))   // 1+2+3
    assert(out(1L) == ((3L, 4L, Some(3.0 / 4))))   // 1+1+2
    assert(out(2L) == ((3L, 4L, Some(3.0 / 4))))
    assert(out(3L) == ((3L, 6L, Some(3.0 / 6))))
    assert(out(9L) == ((0L, 0L, None)), "isolated: no reach, NULL")
    val e = intercept[IllegalStateException] {
      Graph.bfsCloseness(nodes, edges, maxDepth = 1)
    }
    assert(e.getMessage.contains("frontier still growing"))
  }

  test("g08 teleport locality: PPR mass is zero on domains with no " +
    "seed-reachable in-path within two hops, while global PR (g01) is " +
    "strictly positive everywhere — the property that distinguishes them") {
    val docs = Tables.t(spark, sf, "documents")
    val ppr = Graph.domainPpr2(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Graph.domainPagerank2(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.values.forall(_ > 0L), "global PR teleports everywhere")
    assert(ppr.values.exists(_ == 0L),
      s"expected at least one zero-mass domain, got ${ppr.values.min}")
    // seeds themselves always carry at least the teleport term
    (0L to 9L).filter(ppr.contains).foreach(v =>
      assert(ppr(v) >= 60L, s"seed $v lost its teleport mass: ${ppr(v)}"))
  }

  test("link prediction: hand-computed candidates on a 4-cycle (both " +
    "diagonals at jaccard 1.0) and a path (endpoints share the middle); " +
    "adjacent pairs never appear") {
    val sq = spark; import sq.implicits._
    // square 0-1-2-3-0: non-edges (0,2) and (1,3); each pair shares
    // BOTH its neighbors -> cn=2, deg 2/2, jaccard 2/(2+2-2)=1.0
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("lo", "hi")
    val gotSq = Graph.linkPrediction(square).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(gotSq == Map(
      (0L, 2L) -> ((2L, 2L, 2L, 1.0)), (1L, 3L) -> ((2L, 2L, 2L, 1.0))),
      gotSq.toString)
    // path 10-11-12: one candidate (10,12), cn=1, jaccard 1/(1+1-1)=1
    val gotPath = Graph.linkPrediction(
        Seq((10L, 11L), (11L, 12L)).toDF("lo", "hi")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(gotPath.toSeq == Seq((10L, 12L, 1L, 1.0)), gotPath.toSeq)
  }

  test("kTruss cascades: a triangle book's spine starts above the " +
    "support threshold (a single-pass filter would keep it) but " +
    "collapses once the pages peel; an attached 4-clique survives") {
    val sq = spark; import sq.implicits._
    // book: spine (0,1) + pages 2,3 -> spine support 2 (= k-2 for
    // k=4), page edges support 1. Round 1 peels pages, round 2 the
    // spine. 4-clique {10,11,12,13} (every edge support 2, stable)
    // bridged to the book via (1,10) so the frame is one component.
    val book = Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L))
    val k4 = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L))
    val edges = (book ++ k4 :+ ((1L, 10L))).toDF("lo", "hi")
    val got = Graph.kTruss(edges, k = 4).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(got((0L, 1L)) == 0,
      "the book spine must cascade out after its pages peel")
    book.foreach(e => assert(got(e) == 0, s"book edge $e"))
    k4.foreach(e => assert(got(e) == 1, s"clique edge $e must survive"))
    assert(got((1L, 10L)) == 0, "the bridge sits in no triangle")
    assert(got.size == 12, s"every input edge must be flagged: $got")
  }

  test("modularity: two bridged triangles give the hand-computed " +
    "Q = 70/196 under the triangle partition, and exactly 0 under " +
    "the trivial one-community partition") {
    val sq = spark; import sq.implicits._
    // triangles {0,1,2} and {3,4,5}, bridge (2,3): m=7, each side has
    // e_c=3 intra edges and degree sum 7 -> contrib 4*7*3 - 49 = 35
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L)).toDF("lo", "hi")
    val twoCs = (0L to 5L).map(v => (v, v / 3)).toDF("v", "c")
    val got = Graph.modularity(edges, twoCs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 3L, 7L, 35L, 7L, 70.0 / 196.0),
      (1L, 3L, 7L, 35L, 7L, 70.0 / 196.0)), got.toSeq.toString)
    // degenerate partition: everything in one community -> Q = 0
    // (4m*m - (2m)^2 = 0), the classic normalization property
    val oneC = (0L to 5L).map(v => (v, 0L)).toDF("v", "c")
    val q0 = Graph.modularity(edges, oneC).collect()
    assert(q0.length == 1 && q0.head.getDouble(5) == 0.0 &&
      q0.head.getLong(3) == 0L, q0.toSeq.toString)
  }

  test("sccLabels separates a directed 3-cycle from its tail and from " +
    "a 2-cycle a one-way bridge points at — undirected CC would merge " +
    "all three") {
    val sq = spark; import sq.implicits._
    // 0->1->2->0 (3-cycle), 3->0 (tail INTO the cycle), 2->4 (one-way
    // bridge), 4<->5 (2-cycle)
    val nodes = (0L to 5L).map(Tuple1(_)).toDF("v")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L), (2L, 4L),
      (4L, 5L), (5L, 4L)).toDF("src", "dst")
    val got = Graph.sccLabels(nodes, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (0L, 0L, 3L), (1L, 0L, 3L), (2L, 0L, 3L), // the 3-cycle
      (3L, 3L, 1L),                             // tail: reaches, never
                                                // reached back
      (4L, 4L, 2L), (5L, 4L, 2L)), got.toString) // the 2-cycle
    // contrast: undirected CC on the same edges is ONE component
    val cc = Graph.ccLargeSmallStar(nodes.toDF("doc_id"), edges)
      .collect().map(_.getLong(1)).toSet
    assert(cc == Set(0L), s"undirected CC must merge everything: $cc")
  }

  test("labelPropagation: round 1 reduces to min-neighbor, round 2 " +
    "follows the true majority, a frequency TIE resolves to the min " +
    "label, and an isolated node keeps its own label both rounds") {
    val sq = spark; import sq.implicits._
    // 1-2, 1-3, 2-3, 2-4, 3-4, 2-5, 4-5; 9 isolated.
    // round 2 at node 5: neighbor labels {1 (from 2), 2 (from 4)} —
    // a 1:1 frequency tie that must resolve to label 1
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L).map(Tuple1(_)).toDF("v")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 5L), (4L, 5L)).toDF("lo", "hi")
    val got = Graph.labelPropagation(nodes, edges, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      (1L, 2L, 1L), (2L, 1L, 2L), (3L, 1L, 2L), (4L, 2L, 1L),
      (5L, 2L, 1L),   // round-2 tie -> min label
      (9L, 9L, 9L)),  // isolated: self label survives both rounds
      got.toString)
  }

  test("g14 projection invariants: shared count never exceeds either " +
    "capped degree, the scaled jaccard stays <= 10000, and the " +
    "fixture fires BOTH cap arms (hub visitors trimmed, light ones " +
    "kept whole)") {
    val out = QueryCatalog.byName("g14_bipartite_projection")
      .build(spark, sf).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("n_shared") >
        org.apache.spark.sql.functions.least(col("d_i"),
        col("d_j"))).count() == 0)
      assert(out.filter(col("jac_bp") > 10000).count() == 0)
      val fanout = Tables.t(spark, sf, "events")
        .select((col("event_id") % 50).as("u"),
          (col("user_id") % 30).as("i")).distinct()
        .groupBy("u").count()
      assert(fanout.filter(col("count") > 10).count() > 0,
        "fixture must contain hub visitors above the cap")
      assert(fanout.filter(col("count") <= 10).count() > 0,
        "fixture must contain visitors under the cap")
    } finally out.unpersist()
  }
}
