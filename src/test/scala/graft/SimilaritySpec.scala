package graft

import org.apache.spark.sql.functions._

/** KNN correctness on hand-checkable vectors + ANN recall vs the exact
  * brute-force oracle (promised by the Similarity scaladoc). */
class SimilaritySpec extends SparkSpec {

  test("brute-force top-k ranks hand-computed cosines correctly") {
    val sq = spark; import sq.implicits._
    // unit vectors: cos(q, a)=1.0 direction, cos(q, b)=0.7071, cos(q, c)=0
    val corpus = Seq(
      (10L, Array(1f, 0f)),   // same direction as query
      (11L, Array(1f, 1f)),   // 45 degrees
      (12L, Array(0f, 1f)))   // orthogonal
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, Array(2f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(queries, corpus, 3)
      .orderBy("rn").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L))
    assert(got.map(_.getDouble(2)).toSeq == Seq(1.0, 0.7071, 0.0))
  }

  test("ann recall@5 vs brute force is usable at 4 bits with multi-probe") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(queries, emb, 5, bits = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall")
    // and the candidate set really is pruned (not brute force in disguise):
    // ann examines ~(bits+1)/2^bits of the corpus per query
    assert(ann.size <= exact.size)
  }

  test("ivf recall@5 vs brute force beats random cell scanning") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, emb, 5, nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    // nprobe/nlist = 25% of cells scanned; data-adaptive cells should
    // comfortably beat that scan fraction in recall
    assert(recall >= 0.4, s"ivf recall $recall")
  }

  test("ivf with sample-bounded training (the 100 TB quantizer path) " +
    "still recalls usefully and is deterministic across runs") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity
      .ivfTopK(queries, emb, 5, nlist = 8, nprobe = 3, trainCap = 200)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run()
    val recall = a.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3,
      s"sample-trained ivf recall $recall (cap=200 of ${emb.count()} rows)")
    assert(run() == a, "hash-threshold sampling must be deterministic")
  }

  test("native sign_bucket expression is bit-identical to the HOF " +
    "formulation on the full fixture (incl. empty and null vectors)") {
    val emb = Tables.t(spark, sf, "embeddings")
    // native reads the RAW float array (per-element widening); the HOF
    // needs the pre-cast double array — results must still agree exactly
    val diff = emb.select(
        Similarity.signBucket(col("embedding"), 6).as("native"),
        Similarity.signBucketHof(
          Similarity.toDouble(col("embedding")), 6).as("hof"))
      .filter(not(col("native") === col("hof")))
    assert(diff.count() == 0)
    val sq = spark; import sq.implicits._
    val edge = Seq(Tuple1(Seq.empty[Double])).toDF("v").select(
      Similarity.signBucket(col("v"), 4).as("e"),
      Similarity.signBucket(lit(null).cast("array<double>"), 4).as("n"),
      Similarity.signBucketHof(col("v"), 4).as("ehof")).collect().head
    // empty vector buckets to 0 in BOTH forms (the HOF's zip_with null
    // padding nulls the plane sum; `when` falls through to 0)
    assert(edge.getLong(0) == 0L && edge.getLong(0) == edge.getLong(2))
    assert(edge.isNullAt(1))
  }

  test("native CosineSimilarity expression matches the HOF composition " +
    "bit-for-bit and runs inside codegen") {
    val emb = Tables.t(spark, sf, "embeddings").limit(200)
    val both = emb.select(
      VectorExpressions.cosineSim(
        Similarity.toDouble(col("embedding")),
        Similarity.toDouble(col("embedding"))).as("native"),
      (Similarity.dot(Similarity.toDouble(col("embedding")),
        Similarity.toDouble(col("embedding"))) /
        (Similarity.l2normHof(Similarity.toDouble(col("embedding"))) *
          Similarity.l2normHof(Similarity.toDouble(col("embedding")))))
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // self-similarity is exactly 1.0 up to fp; and codegen accepted the
    // expression (no fallback marker in the plan)
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim") || plan.contains("cosinesimilarity") ||
      plan.toLowerCase.contains("cosine"))
  }

  test("native norm_l2 on the raw float array is bit-identical to the HOF " +
    "fold on the pre-cast double array") {
    val emb = Tables.t(spark, sf, "embeddings")
    val diff = emb.select(
        Similarity.l2norm(col("embedding")).as("native"),
        Similarity.l2normHof(Similarity.toDouble(col("embedding"))).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("cosine_sim is callable from SQL through ExecutionContext") {
    val v = new ExecutionContext(spark)
      .execute("SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("heap rankTopK equals the row_number window ranking row-for-row " +
    "on real scored candidates (order, ties, and rn included)") {
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      // coarse rounding manufactures plenty of sim TIES, so the
      // neighbor_id tie-break is genuinely exercised
      .withColumn("sim",
        round(VectorExpressions.cosineSim(col("qv"), col("cv")), 1))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rn")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getInt(3))).toSeq
    assert(rows(Similarity.rankTopK(scored, 7)) ==
      rows(Similarity.rankTopKWindow(scored, 7)))
  }

  test("heap rankTopK keeps Spark's NaN-is-largest double ordering, same " +
    "as the window sort (zero-norm vectors score NaN)") {
    val sq = spark; import sq.implicits._
    val scored = Seq(
      (1L, 100L, 0.5), (1L, 101L, Double.NaN), (1L, 102L, 0.9),
      (1L, 103L, Double.NaN), (1L, 104L, -0.2))
      .toDF("query_id", "neighbor_id", "sim")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rn").collect()
        .map(r => (r.getLong(1), r.getInt(3))).toSeq
    val heap = rows(Similarity.rankTopK(scored, 3))
    assert(heap == rows(Similarity.rankTopKWindow(scored, 3)))
    // NaNs rank FIRST (Spark treats NaN as larger than any double),
    // tie-broken by neighbor_id
    assert(heap == Seq((101L, 1), (103L, 2), (102L, 3)))
  }

  test("similarity ranking plans are partial+final aggregates with no " +
    "Window and no per-query Sort (the shuffle carries k rows per query)") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    for (df <- Seq(
        Similarity.bruteForceTopK(queries, emb, 10),
        Similarity.annTopK(queries, emb, 5, bits = 4),
        Similarity.ivfTopK(queries, emb, 5, nlist = 8, nprobe = 3))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"window ranking survived:\n$plan")
      assert(plan.contains("ObjectHashAggregate") &&
        plan.contains("partial_topk_neighbors"),
        s"expected partial topk_neighbors aggregation:\n$plan")
    }
  }

  test("null array ELEMENTS propagate like the HOF twins: cosine/norm " +
    "give NULL (not a silent 0.0 read), sign bucket gives 0") {
    val sq = spark; import sq.implicits._
    val df = Seq(1).toDF("x").select(
      array(lit(1.0), lit(null).cast("double")).as("v"),
      array(lit(1.0), lit(2.0)).as("w"))
    val r = df.select(
      VectorExpressions.cosineSim(col("v"), col("w")).as("c"),
      VectorExpressions.normL2(col("v")).as("n"),
      Similarity.signBucket(col("v"), 4).as("b"),
      Similarity.signBucketHof(col("v"), 4).as("bh")).collect().head
    assert(r.isNullAt(0), "cosine over a null element must be NULL")
    assert(r.isNullAt(1), "norm over a null element must be NULL")
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
      "sign bucket over a null element must be 0, matching the HOF")
    // non-null inputs are unaffected
    val ok = df.select(
      VectorExpressions.cosineSim(col("w"), col("w"))).collect().head
    assert(math.abs(ok.getDouble(0) - 1.0) < 1e-12)
  }

  test("TopKHeap serialize/deserialize roundtrips the exact heap layout " +
    "and merge respects capacity (the shuffle path of the aggregate)") {
    val agg = TopKNeighbors(null, null, 3)
    val h = new TopKHeap(3)
    Seq((1L, 0.5), (2L, 0.9), (3L, 0.1), (4L, 0.7), (5L, Double.NaN))
      .foreach { case (id, s) => h.insert(id, s) }
    val back = agg.deserialize(agg.serialize(h))
    assert(back.k == h.k && back.size == h.size)
    assert(back.ids.toSeq == h.ids.toSeq &&
      back.sims.toSeq.map(java.lang.Double.doubleToLongBits) ==
        h.sims.toSeq.map(java.lang.Double.doubleToLongBits))
    // merging two partial heaps keeps the global best-3:
    // NaN ranks largest, then 0.9, then 0.8
    val other = new TopKHeap(3)
    Seq((6L, 0.8), (7L, 0.2)).foreach { case (id, s) => other.insert(id, s) }
    h.mergeFrom(other)
    val kept = h.sortedIndices.map(i => h.ids(i)).toSeq
    assert(kept == Seq(5L, 2L, 6L))
  }

  test("topk_neighbors is callable from SQL through ExecutionContext") {
    val got = new ExecutionContext(spark).execute(
      """SELECT topk_neighbors(id, sim, 2) AS nb FROM VALUES
        |(10L, 0.5d), (11L, 0.9d), (12L, 0.9d), (13L, 0.1d) AS t(id, sim)"""
        .stripMargin)
      .selectExpr("inline(nb)").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // ties (0.9, 0.9) break on the lower id first
    assert(got == Seq((11L, 0.9), (12L, 0.9)))
  }

  test("a repeated ivfTopK on the same corpus reuses the built index " +
    "(no re-train, no re-assignment scan of the corpus)") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
    def run() = Similarity
      .ivfTopK(queries, emb, 3, nlist = 4, nprobe = 2, trainCap = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val first = run()
    val buildsAfterFirst = Similarity.ivfIndexBuilds
    val second = run()
    assert(Similarity.ivfIndexBuilds == buildsAfterFirst,
      "second identical query must not rebuild the IVF index")
    assert(second == first)
    // a cache HIT after the caller's releaseAll must RE-persist the
    // assigned frame (not hand back a permanently unpersisted plan)
    ManagedCache.releaseAll()
    val third = run()
    assert(Similarity.ivfIndexBuilds == buildsAfterFirst,
      "releaseAll must not force an index rebuild")
    assert(third == first)
    assert(ManagedCache.trackedCount > 0,
      "the assigned frame must be re-registered for caching after a hit")
  }

  test("ann results are exact cosines over its candidates (no approximate " +
    "scores, only approximate candidate sets)") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val exactSims = Similarity.bruteForceTopK(queries, emb, 200)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    val annSims = Similarity.annTopK(queries, emb, 5, bits = 4)
      .select(col("query_id").as("q"), col("neighbor_id").as("n"),
        col("sim").as("asim"))
    val joined = annSims.join(exactSims,
      col("q") === col("query_id") && col("n") === col("neighbor_id"))
    assert(joined.filter(col("asim") =!= col("sim")).count() == 0)
  }

  test("quantizeInt8: stats match a driver-side requantization of the " +
    "fixture, elements stay in [-127,127], and the zero vector is safe") {
    val emb = Tables.t(spark, sf, "embeddings")
    val got = Similarity.quantizeInt8(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toMap
    val raw = emb.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)
    }
    assert(raw.nonEmpty)
    raw.foreach { case (id, v) =>
      val scale = math.max(v.map(math.abs).max / 127.0, 1e-12)
      val q = v.map(x => BigDecimal(x / scale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(q.forall(e => e >= -127 && e <= 127))
      // max dequantization error of symmetric int8 is scale/2 per element
      assert(v.zip(q).forall { case (x, e) =>
        math.abs(x - e * scale) <= scale / 2 + 1e-9 })
      val (dim, qscale, qSum, qNorm2) = got(id)
      assert(dim == v.length.toLong)
      assert(qscale == BigDecimal(scale)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(qSum == q.sum)
      assert(qNorm2 == q.map(e => e * e).sum)
    }
    // all-zero vector: the 1e-12 scale floor keeps 0/0 out of the fold
    val sq = spark; import sq.implicits._
    val zero = Seq((99L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val zr = Similarity.quantizeInt8(zero).collect().head
    assert(zr.getLong(3) == 0L && zr.getLong(4) == 0L)
  }

  test("ANN serving from the int8-compressed corpus: brute-force top-k " +
    "over dequantized vectors recalls >= 0.9 of the full-precision top-k") {
    val emb = Tables.t(spark, sf, "embeddings")
    // dequantized corpus rebuilt from the COMPRESSED representation only
    // (qscale + tinyint array) — float32 cast keeps bruteForceTopK's
    // native cosine on its raw-float fast path
    val deq = Similarity.quantizeInt8Vectors(emb)
      .select(col("vec_id"),
        transform(col("qv"), x => (x * col("qscale")).cast("float"))
          .as("embedding"))
    def topk(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(corpus.filter(col("vec_id") < 10), corpus, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = topk(emb)
    val quant = topk(deq)
    val recall = quant.intersect(full).size.toDouble / full.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("hardNegatives returns only DIFFERENT-label neighbors, exactly k " +
    "per query, ranked like the positive top-k") {
    val emb = Tables.t(spark, sf, "embeddings")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.hardNegatives(emb.filter(col("vec_id") < 5), emb, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(rows.nonEmpty)
    // the defining property: every negative is a wrong-label example
    assert(rows.forall { case (q, n, _) => labels(q) != labels(n) })
    // exactly k per query, ranks 1..k
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length == 10 && g.map(_._3).sorted.toSeq == (1 to 10))
    }
  }

  test("IVF index save/load round trip: querying the loaded index " +
    "returns exactly the live-index answer without retraining") {
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    val live = Similarity.ivfTopK(q, emb, 5, nlist = 16, nprobe = 4)
      .collect().map(r => r.toSeq).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx").toString
    val buildsBefore = Similarity.ivfIndexBuilds
    Similarity.saveIvfIndex(dir, emb, nlist = 16)
    // save reuses the session-cached index — no second train+assign
    assert(Similarity.ivfIndexBuilds == buildsBefore)
    ManagedCache.releaseAll() // serving session starts cold
    val (model, assigned) = Similarity.loadIvfIndex(spark, dir)
    val loaded = Similarity.ivfQuery(q, model, assigned, 5, nprobe = 4)
      .collect().map(r => r.toSeq).toSet
    assert(loaded == live && loaded.nonEmpty)
    ManagedCache.releaseAll()
  }

  test("commit-anchored IVF index: a pure-insert MoR commit refreshes " +
    "ASSIGN-ONLY (identical centroids, no retrain) and equals a " +
    "from-scratch assignment under the saved quantizer; an update " +
    "commit (vector grew) rebuilds") {
    val emb = Tables.t(spark, sf, "embeddings")
    val root = Dml.work("ivf_store", sf)
    Layouts.deleteDir(spark, root)
    val storeDir = s"$root/store"
    Dml.delete(emb, storeDir, lit(false)) // publish the committed table
    val idx = s"$root/index"
    Similarity.saveIvfIndexForStore(spark, storeDir, idx, nlist = 16)
    // no commit → no work
    assert(Similarity.refreshIvfIndexForStore(spark, idx, nlist = 16)
      == "fresh")
    def centroids() = org.apache.spark.ml.clustering.KMeansModel
      .load(s"$idx/model").clusterCenters.map(_.toArray.toSeq).toSeq
    val centroidsBefore = centroids()
    val buildsBefore = Similarity.ivfIndexBuilds
    // the anchor as of the save — the stale state the crash-replay arm
    // below restores
    val staleAnchorBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(idx, "anchor"))
    // PURE-INSERT merge-on-read commit: fresh ids, join keys that can
    // never match a committed row — everything lands in the append
    // sidecar, the data directory never changes
    val cols = emb.columns.toSeq
    val src = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("sk", -col("vec_id") - 1)
    Dml.mergeOnRead(spark, storeDir, src,
      col("t.vec_id") === col("s.sk"),
      Map("label" -> col("t.label")),
      Some(cols), Some(cols.map(c => col(s"s.$c"))))
    assert(Similarity.refreshIvfIndexForStore(spark, idx, nlist = 16)
      == "assigned")
    assert(Similarity.ivfIndexBuilds == buildsBefore,
      "assign-only refresh must not retrain")
    assert(centroids() == centroidsBefore,
      "assign-only refresh must keep the quantizer bit-identical")
    // exactness: the refreshed assigned corpus equals a from-scratch
    // assignment of the CURRENT logical table under the saved model
    ManagedCache.releaseAll()
    val (model, assigned) = Similarity.loadIvfIndex(spark, idx)
    val got = assigned.select("neighbor_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    import org.apache.spark.ml.functions.array_to_vector
    val cur = Dml.readVersion(spark, storeDir, Dml.currentVersion(storeDir))
    val want = model.transform(cur
        .select(col("vec_id").as("neighbor_id"),
          Similarity.toDouble(col("embedding")).as("cv"))
        .withColumn("features", array_to_vector(col("cv"))))
      .select("neighbor_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == want && got.size > emb.count().toInt,
      "refreshed index must cover base + appended rows exactly")
    // and the loaded index serves queries over the refreshed corpus
    val res = Similarity.ivfQuery(
      emb.filter(col("vec_id") < 5), model, assigned, 5, nprobe = 4)
    assert(res.count() > 0)
    // CRASH REPLAY: a refresh that died between the delta append and
    // the anchor write leaves the delta committed under a STALE anchor,
    // and the next refresh recomputes the same delta. Simulate by
    // restoring the pre-commit anchor: the re-run classifies "assigned"
    // again but the neighbor_id dedup must append NOTHING.
    val anchorP = java.nio.file.Paths.get(idx, "anchor")
    val rowsAfter = spark.read.parquet(s"$idx/assigned").count()
    java.nio.file.Files.write(anchorP, staleAnchorBytes)
    assert(Similarity.refreshIvfIndexForStore(spark, idx, nlist = 16)
      == "assigned")
    assert(spark.read.parquet(s"$idx/assigned").count() == rowsAfter,
      "a replayed refresh must not double-append the delta")
    assert(centroids() == centroidsBefore)
    // an UPDATE commit grows the deletion vector → rebuild (retrain)
    val upd = emb.filter(col("vec_id") === 3)
      .withColumn("sk", col("vec_id"))
    Dml.mergeOnRead(spark, storeDir, upd,
      col("t.vec_id") === col("s.sk"),
      Map("label" -> (col("t.label") + lit(1))),
      Some(cols), Some(cols.map(c => col(s"s.$c"))))
    assert(Similarity.refreshIvfIndexForStore(spark, idx, nlist = 16)
      == "rebuilt")
    assert(Similarity.ivfIndexBuilds == buildsBefore + 1,
      "a composition-breaking commit must retrain")
    assert(rowsAfter > 0)
    ManagedCache.releaseAll()
  }

  test("commit-anchored PQ index: pure-insert commit refreshes " +
    "ENCODE-ONLY (codebooks bit-identical, no retrain), a REPLAYED " +
    "refresh after a crash between append and anchor write appends " +
    "nothing, and an update commit rebuilds") {
    val emb = Tables.t(spark, sf, "embeddings")
    val root = Dml.work("pq_store", sf)
    Layouts.deleteDir(spark, root)
    val storeDir = s"$root/store"
    Dml.delete(emb, storeDir, lit(false))
    val idx = s"$root/index"
    Similarity.savePqIndexForStore(spark, storeDir, idx, m = 32, ksub = 16)
    assert(Similarity.refreshPqIndexForStore(spark, idx, m = 32, ksub = 16)
      == "fresh")
    def codebooks() = (0 until 32).map(j =>
      org.apache.spark.ml.clustering.KMeansModel.load(s"$idx/sub_$j")
        .clusterCenters.map(_.toArray.toSeq).toSeq)
    val cbBefore = codebooks()
    val baseRows = spark.read.parquet(s"$idx/codes").count()
    val anchorP = java.nio.file.Paths.get(idx, "anchor")
    val staleAnchor = java.nio.file.Files.readAllBytes(anchorP)
    // pure-insert MoR commit (the IVF test's construction)
    val cols = emb.columns.toSeq
    val src = emb.filter(col("vec_id") % 7 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("sk", -col("vec_id") - 1)
    Dml.mergeOnRead(spark, storeDir, src,
      col("t.vec_id") === col("s.sk"),
      Map("label" -> col("t.label")),
      Some(cols), Some(cols.map(c => col(s"s.$c"))))
    val deltaRows = src.count()
    assert(Similarity.refreshPqIndexForStore(spark, idx, m = 32, ksub = 16)
      == "encoded")
    assert(codebooks() == cbBefore,
      "encode-only refresh must keep every sub-codebook bit-identical")
    val afterRows = spark.read.parquet(s"$idx/codes").count()
    assert(afterRows == baseRows + deltaRows,
      s"codes must grow by exactly the delta: $baseRows + $deltaRows " +
        s"!= $afterRows")
    // CRASH REPLAY: restore the stale anchor — the re-run recomputes the
    // same delta, classifies "encoded", but the dedup appends nothing
    java.nio.file.Files.write(anchorP, staleAnchor)
    assert(Similarity.refreshPqIndexForStore(spark, idx, m = 32, ksub = 16)
      == "encoded")
    assert(spark.read.parquet(s"$idx/codes").count() == afterRows,
      "a replayed refresh must not double-append the delta")
    assert(codebooks() == cbBefore)
    // the refreshed index SERVES: top-k from codes-at-rest over base +
    // appended rows, every neighbor a real corpus id
    val res = Similarity.pqIndexTopK(spark,
      emb.filter(col("vec_id") < 5), idx, 5)
    assert(res.count() > 0)
    val ids = Dml.readVersion(spark, storeDir, Dml.currentVersion(storeDir))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(res.collect().forall(r => ids.contains(r.getLong(1))))
    // an UPDATE commit grows the vector → rebuild (retrain)
    val upd = emb.filter(col("vec_id") === 3)
      .withColumn("sk", col("vec_id"))
    Dml.mergeOnRead(spark, storeDir, upd,
      col("t.vec_id") === col("s.sk"),
      Map("label" -> (col("t.label") + lit(1))),
      Some(cols), Some(cols.map(c => col(s"s.$c"))))
    assert(Similarity.refreshPqIndexForStore(spark, idx, m = 32, ksub = 16)
      == "rebuilt")
    ManagedCache.releaseAll()
  }

  test("commit-anchored IVF+PQ index: pure-insert commit refreshes " +
    "assign+encode-only (coarse centroids AND sub-codebooks " +
    "bit-identical), the served answer covers the appended rows, and " +
    "an update commit rebuilds") {
    val emb = Tables.t(spark, sf, "embeddings")
    val root = Dml.work("ivfpq_store", sf)
    Layouts.deleteDir(spark, root)
    val storeDir = s"$root/store"
    Dml.delete(emb, storeDir, lit(false))
    val idx = s"$root/index"
    Similarity.saveIvfPqIndexForStore(spark, storeDir, idx,
      nlist = 8, m = 32, ksub = 16)
    assert(Similarity.refreshIvfPqIndexForStore(spark, idx,
      nlist = 8, m = 32, ksub = 16) == "fresh")
    def coarseCentroids() = org.apache.spark.ml.clustering.KMeansModel
      .load(s"$idx/coarse").clusterCenters.map(_.toArray.toSeq).toSeq
    def codebooks() = (0 until 32).map(j =>
      org.apache.spark.ml.clustering.KMeansModel.load(s"$idx/sub_$j")
        .clusterCenters.map(_.toArray.toSeq).toSeq)
    val coarseBefore = coarseCentroids()
    val cbBefore = codebooks()
    val baseRows = spark.read.parquet(s"$idx/index").count()
    val cols = emb.columns.toSeq
    val src = emb.filter(col("vec_id") % 5 === 0)
      .withColumn("vec_id", col("vec_id") + 2000000L)
      .withColumn("sk", -col("vec_id") - 1)
    Dml.mergeOnRead(spark, storeDir, src,
      col("t.vec_id") === col("s.sk"),
      Map("label" -> col("t.label")),
      Some(cols), Some(cols.map(c => col(s"s.$c"))))
    assert(Similarity.refreshIvfPqIndexForStore(spark, idx,
      nlist = 8, m = 32, ksub = 16) == "encoded")
    assert(coarseCentroids() == coarseBefore && codebooks() == cbBefore,
      "assign+encode-only refresh must not move any centroid")
    assert(spark.read.parquet(s"$idx/index").count() ==
      baseRows + src.count())
    // the served top-k CAN surface appended rows: query near an
    // appended vector's original (the appended copy is id+2000000 of an
    // existing embedding, so it is that query's nearest non-self point)
    val probeIds = emb.filter(col("vec_id") % 5 === 0)
      .select("vec_id").limit(3).collect().map(_.getLong(0))
    val res = Similarity.ivfPqIndexTopK(spark,
      emb.filter(col("vec_id").isin(probeIds: _*)), idx, 5, nprobe = 4)
      .collect()
    assert(res.nonEmpty &&
      res.exists(_.getLong(1) >= 2000000L),
      s"appended rows must be servable: ${res.mkString("|")}")
    val upd = emb.filter(col("vec_id") === 3)
      .withColumn("sk", col("vec_id"))
    Dml.mergeOnRead(spark, storeDir, upd,
      col("t.vec_id") === col("s.sk"),
      Map("label" -> (col("t.label") + lit(1))),
      Some(cols), Some(cols.map(c => col(s"s.$c"))))
    assert(Similarity.refreshIvfPqIndexForStore(spark, idx,
      nlist = 8, m = 32, ksub = 16) == "rebuilt")
    ManagedCache.releaseAll()
  }

  test("commit-anchored LSH index: serving from codes-at-rest equals the " +
    "live annTopK bit-for-bit, a pure-insert commit refreshes BUCKET-ONLY " +
    "(pre-existing codes untouched, codes equal a from-scratch bucketing), " +
    "a replayed refresh appends nothing, and an update commit rebuilds") {
    val emb = Tables.t(spark, sf, "embeddings")
    val root = Dml.work("lsh_store", sf)
    Layouts.deleteDir(spark, root)
    val storeDir = s"$root/store"
    Dml.delete(emb, storeDir, lit(false))
    val idx = s"$root/index"
    Similarity.saveLshIndexForStore(spark, storeDir, idx, bits = 4)
    assert(Similarity.refreshLshIndexForStore(spark, idx) == "fresh")
    // serving path: the saved codes answer EXACTLY what the live
    // bucketing answers — no trained model exists, so the only degree
    // of freedom is the deterministic bucket function itself
    val q = emb.filter(col("vec_id") < 20)
    val live = Similarity.annTopK(q, emb, 5, bits = 4)
      .collect().map(_.toSeq).toSet
    val served = Similarity.lshIndexTopK(spark, q, idx, 5)
      .collect().map(_.toSeq).toSet
    assert(served == live && served.nonEmpty)
    def codeSet() = spark.read.parquet(s"$idx/codes")
      .select("neighbor_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val codesBefore = codeSet()
    val staleAnchorBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(idx, "anchor"))
    // PURE-INSERT merge-on-read commit (fresh ids, unmatched keys)
    val cols = emb.columns.toSeq
    val src = emb.filter(col("vec_id") % 9 === 0)
      .withColumn("vec_id", col("vec_id") + 3000000L)
      .withColumn("sk", -col("vec_id") - 1)
    Dml.mergeOnRead(spark, storeDir, src,
      col("t.vec_id") === col("s.sk"),
      Map("label" -> col("t.label")),
      Some(cols), Some(cols.map(c => col(s"s.$c"))))
    assert(Similarity.refreshLshIndexForStore(spark, idx) == "bucketed")
    val codesAfter = codeSet()
    assert(codesBefore.subsetOf(codesAfter),
      "bucket-only refresh must leave pre-existing codes untouched")
    assert(codesAfter.size == codesBefore.size + src.count(),
      "codes must grow by exactly the appended rows")
    // exactness: the refreshed codes equal a from-scratch bucketing of
    // the CURRENT logical table (determinism makes delta-only bucketing
    // lossless, not just cheap)
    val cur = Dml.readVersion(spark, storeDir, Dml.currentVersion(storeDir))
    val want = cur.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"))
      .withColumn("bucket", Similarity.signBucket(col("cv"), 4))
      .select("neighbor_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(codesAfter == want)
    // the appended rows are servable: an appended vector is the exact
    // copy of an existing one, so querying the original surfaces it
    val probeIds = emb.filter(col("vec_id") % 9 === 0)
      .select("vec_id").limit(3).collect().map(_.getLong(0))
    val res = Similarity.lshIndexTopK(spark,
      emb.filter(col("vec_id").isin(probeIds: _*)), idx, 5).collect()
    assert(res.nonEmpty && res.exists(_.getLong(1) >= 3000000L),
      s"appended rows must be servable: ${res.mkString("|")}")
    // CRASH REPLAY: stale anchor → same delta recomputed, dedup appends
    // nothing
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "anchor"), staleAnchorBytes)
    assert(Similarity.refreshLshIndexForStore(spark, idx) == "bucketed")
    assert(codeSet().size == codesAfter.size,
      "a replayed refresh must not double-append the delta")
    // an UPDATE commit grows the deletion vector → rebuild
    val upd = emb.filter(col("vec_id") === 3)
      .withColumn("sk", col("vec_id"))
    Dml.mergeOnRead(spark, storeDir, upd,
      col("t.vec_id") === col("s.sk"),
      Map("label" -> (col("t.label") + lit(1))),
      Some(cols), Some(cols.map(c => col(s"s.$c"))))
    assert(Similarity.refreshLshIndexForStore(spark, idx) == "rebuilt")
    ManagedCache.releaseAll()
  }

  test("semDedup pairs are an exact-cosine subset of brute force with " +
    "usable recall, and the keep-table resolves min-id per component") {
    val emb = Tables.t(spark, sf, "embeddings")
    val n = emb.count()
    // brute-force ground truth: all pairs a < b with cos >= 0.35
    val l = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
    val r = emb.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val brute = l.join(r, col("a") < col("b"))
      .withColumn("cos",
        round(VectorExpressions.cosineSim(col("va"), col("vb")), 4))
      .filter(col("cos") >= 0.35)
      .select("a", "b", "cos").collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    val got = Similarity.semDedupPairs(emb, 0.35, nlist = 16).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    // precision 1.0: every emitted pair is a true >= threshold pair with
    // the exact cosine (cell-local blocks never change the similarity)
    assert(got.forall { case (k, v) => brute.get(k).contains(v) })
    // recall: cross-cell pairs are the accepted loss; the cells must
    // still capture a usable share of the true pairs
    val recall = got.size.toDouble / brute.size
    assert(brute.nonEmpty && recall >= 0.3,
      s"semdedup recall $recall over ${brute.size} true pairs")
    // keep-table: union-find over the FOUND pairs gives each vector's
    // component min — the keep table must agree, and keep == (self is rep)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val rt = find(p); parent(x) = rt; rt }
    }
    got.keys.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val keep = Similarity.semDedupKeep(emb, 0.35, nlist = 16).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
    ManagedCache.releaseAll()
    assert(keep.length == n)
    keep.foreach { case (id, rep, k) =>
      assert(rep == find(id), s"vec $id: rep $rep != component min")
      assert(k == (rep == id))
    }
    // dedup actually fires on the fixture: at least one group collapses
    assert(keep.exists(x => !x._3))
  }

  test("pq codes are m tinyint sub-codes in [0, ksub) for every vector " +
    "(the 32x-compressed corpus representation)") {
    val emb = Tables.t(spark, sf, "embeddings")
    val codes = Similarity.pqCodes(emb, m = 32, ksub = 64)
    val n = emb.count()
    assert(codes.count() == n)
    val bad = codes.filter(size(col("codes")) =!= 32 ||
      exists(col("codes"), c => c < 0 || c >= 64)).count()
    assert(bad == 0, "every code must be a length-32 array of [0,64) bytes")
    ManagedCache.releaseAll()
  }

  test("pq asymmetric top-k recalls usefully vs brute force, reuses the " +
    "built index across queries, and is deterministic across runs") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity.pqTopK(queries, emb, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run()
    val recall = a.intersect(exact).size.toDouble / exact.size
    // 32 subspaces x 64 centroids on the 64-d fixture: reconstruction
    // keeps enough geometry that at least half the exact top-5 survives
    assert(recall >= 0.5, s"pq recall $recall")
    // reuse: the first run() built (or found) the index; later queries on
    // the same (corpus, m, ksub, trainCap) must never build again
    val builds1 = Similarity.pqIndexBuilds
    assert(run() == a, "pq ranking must be deterministic")
    assert(Similarity.pqIndexBuilds == builds1,
      "second query must reuse the session-cached PQ index")
    // exact-k contract: 5 neighbors per query
    val perQuery = Similarity.pqTopK(queries, emb, 5)
      .groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getLong(1) == 5L))
    ManagedCache.releaseAll()
  }

  test("ivf+pq top-k carries both losses (cell pruning + reconstruction) " +
    "yet still recalls usefully, deterministically, reusing its index") {
    val emb = Tables.t(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity.ivfPqTopK(queries, emb, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run()
    val recall = a.intersect(exact).size.toDouble / exact.size
    // strictly harder than either alone: accept the combined loss but
    // demand it beats the 25% random-cell scan fraction
    assert(recall >= 0.3, s"ivf+pq recall $recall")
    val builds1 = Similarity.ivfPqIndexBuilds
    assert(run() == a, "ivf+pq ranking must be deterministic")
    assert(Similarity.ivfPqIndexBuilds == builds1,
      "second query must reuse the combined index")
    // the candidate set is genuinely pruned: nprobe/nlist of the corpus
    assert(a.size <= exact.size)
    ManagedCache.releaseAll()
  }

  test("MMR de-crowds near-duplicate candidates: plain top-2 picks the " +
    "duplicate pair, MMR swaps in the diverse candidate") {
    val sq = spark; import sq.implicits._
    // a and a' are EXACT duplicates (redundancy penalty = 1.0); b is
    // slightly less relevant but genuinely diverse — its similarity to a
    // (0.9969) sits BELOW its relevance (0.9986), so λ=0.5 flips the
    // pick. Plain top-2 = {a, a'}; MMR must keep a then prefer b.
    val corpus = Seq(
      (10L, Array(1f, 0.95f)),  // a
      (11L, Array(1f, 0.95f)),  // a' exact duplicate of a
      (12L, Array(0.9f, 1f)))   // b diverse, slightly less relevant
      .toDF("vec_id", "embedding")
    val queries = Seq((0L, Array(1f, 1f))).toDF("vec_id", "embedding")
    val plain = Similarity.bruteForceTopK(queries, corpus, 2)
      .orderBy("rn").collect().map(_.getLong(1)).toSeq
    assert(plain == Seq(10L, 11L))
    val mmr = Similarity.mmrTopK(queries, corpus, 2, candidateK = 3)
      .orderBy("rn").collect().map(_.getLong(1)).toSeq
    assert(mmr == Seq(10L, 12L))
  }

  test("nearestCentroid labels axis-clustered vectors by the right " +
    "centroid and emits one deterministic row per vector") {
    val sq = spark; import sq.implicits._
    // label 0 clusters on the x axis, label 1 on the y axis; v=20 sits
    // near x, v=21 near y — predictions must follow the geometry
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0.1f, 0.9f), 1),
      (20L, Array(0.8f, 0.2f), 0), (21L, Array(0.2f, 0.8f), 1))
      .toDF("vec_id", "embedding", "label")
    def run() = Similarity.nearestCentroid(emb).drop("rn").collect()
      .map(r => (r.getLong(0), r.getInt(2))).toMap
    val got = run()
    assert(got.size == 6)
    assert(got(20L) == 0 && got(21L) == 1)
    assert(got(0L) == 0 && got(2L) == 1)
    assert(run() == got, "nearest-centroid must be deterministic")
  }

  test("MMR: deterministic, selections contained in the candidate pool, " +
    "first pick equals brute-force top-1") {
    val emb = Tables.t(spark, sf, "embeddings")
    val qs = emb.filter(col("vec_id") < 5)
    def run() = Similarity.mmrTopK(qs, emb, 5, candidateK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    val a = run()
    assert(run() == a, "mmr must be deterministic")
    val pool = Similarity.bruteForceTopK(qs, emb, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.map(h => (h._1, h._2)).subsetOf(pool))
    val top1 = Similarity.bruteForceTopK(qs, emb, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.filter(_._4 == 1).map(h => (h._1, h._2)) == top1,
      "rank-1 MMR pick must be the plain top-1 (empty selected set)")
    // exactly k rows per query, ranks 1..k
    a.groupBy(_._1).foreach { case (_, hits) =>
      assert(hits.map(_._4) == (1 to 5).toSet)
    }
  }

  test("recallViolations (driver-visible audit gate): one violation row " +
    "iff recall < floor, empty when above floor or exact side is empty") {
    val sq = spark; import sq.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "neighbor_id")
    // hits 2 of 4 exact pairs; the extra approx pair must not inflate recall
    val approx = Seq((1L, 10L), (2L, 12L), (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val keys = Seq("query_id", "neighbor_id")
    val viol = Similarity.recallViolations(approx, exact, keys, floor = 0.6)
      .collect()
    assert(viol.length == 1)
    assert(viol(0).getLong(0) == 4 && viol(0).getLong(1) == 2 &&
      viol(0).getDouble(2) == 0.5)
    // at the floor exactly (0.5 < 0.5 is false) → green, no row
    assert(Similarity.recallViolations(approx, exact, keys, 0.5).isEmpty)
    // empty exact side → vacuously green, not a 0/0 violation row
    assert(Similarity.recallViolations(
      approx, exact.limit(0), keys, 0.9).isEmpty)
    // duplicate approx rows must not double-count a hit
    val dup = approx.union(approx)
    val v2 = Similarity.recallViolations(dup, exact, keys, 0.6).collect()
    assert(v2.length == 1 && v2(0).getLong(1) == 2)
  }

  test("recallViolations gates on the UNROUNDED ratio: 19999/20000 under " +
    "a 1.0 containment floor is a violation, not rounded up to green") {
    val sq = spark; import sq.implicits._
    // The masking case: recall 0.99995 rounds to 1.0000 at 4 decimals, so
    // a round-then-compare gate would pass a genuine out-of-pool pick once
    // the exact side exceeds ~20k pairs.
    val exact = sq.range(20000).select(
      col("id").as("query_id"), col("id").as("neighbor_id"))
    val approx = exact.filter(col("query_id") =!= 0L)
    val keys = Seq("query_id", "neighbor_id")
    val v = Similarity.recallViolations(approx, exact, keys, floor = 1.0)
      .collect()
    assert(v.length == 1, "one missed pair under a 1.0 floor must violate")
    assert(v(0).getLong(0) == 20000L && v(0).getLong(1) == 19999L)
    // the emitted row still reports the rounded, readable ratio
    assert(v(0).getDouble(2) == 1.0)
  }

  test("kmeansStep: hand-computed Lloyd round — self-assigning seeds, " +
    "cosine-tie resolution to the lower seed id, and exact integer " +
    "sufficient statistics per (cluster, dim)") {
    val sq = spark; import sq.implicits._
    // seeds (k=2): vec 0 = (1,0), vec 1 = (0,1); members: 2=(2,0) joins
    // cluster 0, 3=(0,3) joins cluster 1, 4=(1,1) ties at cos 0.7071
    // against BOTH seeds and must resolve to the lower cluster id.
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(2f, 0f)),
      (3L, Array(0f, 3f)), (4L, Array(1f, 1f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kmeansStep(emb, 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    ManagedCache.releaseAll()
    // quantized: every vector scales its max-abs to 127, so members of
    // cluster 0 are (127,0),(127,0),(127,127); cluster 1 is (0,127),(0,127)
    assert(got == Map(
      (0, 0) -> ((3L, 381L, 127.0)),
      (0, 1) -> ((3L, 127L, 42.3333)),
      (1, 0) -> ((2L, 0L, 0.0)),
      (1, 1) -> ((2L, 254L, 127.0))))
  }

  test("dimStats: hand-computed per-dimension moments on the quantized " +
    "basis (exact integer sufficient statistics + exact divisions)") {
    val sq = spark; import sq.implicits._
    // quantized rows: (127,0), (127,127), (-127,127)
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(2f, 2f)), (2L, Array(-2f, 2f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.dimStats(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(got == Map(
      1L -> ((3L, 127L, 48387L, -127L, 127L, 127.0 / 3, 129032.0 / 9)),
      2L -> ((3L, 254L, 32258L, 0L, 127L, 254.0 / 3, 32258.0 / 9))),
      got.toString)
  }

  test("matryoshka truncation: 16-dim prefix retrieval keeps measurable " +
    "recall@10 vs the full 64-dim ranking (the MRL accuracy/cost trade)") {
    import org.apache.spark.sql.functions.slice
    val emb = Tables.t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame,
        qf: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(qf, df, 10).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(emb, q)
    val trunc = pairs(
      emb.select(col("vec_id"), slice(col("embedding"), 1, 16)
        .as("embedding")),
      q.select(col("vec_id"), slice(col("embedding"), 1, 16)
        .as("embedding")))
    val recall = (full intersect trunc).size.toDouble / full.size
    // synthetic embeddings spread information uniformly across dims (no
    // MRL training), so this floor is the uniform-noise baseline; an
    // MRL-trained model concentrates it near 1.0
    assert(recall >= 0.2, s"truncated recall@10 = $recall")
  }

  test("binary hamming: hand-computed sign packs and distances, heap " +
    "tie-break by neighbor id (short vectors pad with 0 bits)") {
    val sq = spark; import sq.implicits._
    val emb = Seq(
      (1L, Array(1f, -1f, 1f)), (2L, Array(-1f, 1f, 1f)),
      (3L, Array(1f, 1f, -1f))).toDF("vec_id", "embedding")
    val packs = Similarity.packSignBits(emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(packs == Map(1L -> ((5L, 0L)), 2L -> ((6L, 0L)),
      3L -> ((3L, 0L))), packs.toString)
    val got = Similarity
      .binaryHammingTopK(emb.filter(col("vec_id") === 1), emb, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // both candidates at hamming 2 -> tie breaks by neighbor_id
    assert(got.toSeq == Seq((1L, 2L, 2L, 1), (1L, 3L, 2L, 2)),
      got.toSeq.toString)
  }

  test("centroid drift: zero when both halves share the centroid, " +
    "hand-computed cross-multiplied displacement otherwise") {
    val sq = spark; import sq.implicits._
    // label 7: sides identical (drift 0). label 8: side A quantizes to
    // (127, 0) x1; side B to (0, 127) x1 -> per-dim |d| = 127 each,
    // l1_num = 254, drift = 254 / (1*1*2) = 127.0
    val emb = Seq(
      (0L, Array(1f, 0f), 7), (1L, Array(2f, 0f), 7),
      (2L, Array(1f, 0f), 7), (3L, Array(3f, 0f), 7),
      (4L, Array(5f, 0f), 8), (5L, Array(0f, 2f), 8),
      (6L, Array(1f, 1f), 9) // label 9 exists ONLY on the even side
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidDrift(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))).toMap
    assert(got == Map(
      7 -> ((2L, 2L, 0L, 0.0)),
      8 -> ((1L, 1L, 254L, 127.0)),
      // the vanished-from-one-half class MUST surface, drift undefined
      9 -> ((1L, 0L, -1L, -1.0))), got.toString)
  }

  test("e23 gram matrix: exact integer cells match the hand-computed " +
    "outer-product sums, upper triangle only, all d(d+1)/2 cells " +
    "present including zeros") {
    val sq = spark; import sq.implicits._
    // max |x| = 127 -> qscale = 1, so the quantized vectors ARE the
    // inputs and every cell is hand-checkable integer arithmetic
    def v(a: Float, b: Float, c: Float) =
      Array(a, b, c) ++ Array.fill(13)(0f)
    val emb = Seq(
      (1L, v(127f, 2f, 3f), 0),
      (2L, v(127f, 5f, 7f), 0)).toDF("vec_id", "embedding", "label")
    val q = Similarity.quantizeInt8Vectors(emb)
      .select(col("vec_id"),
        transform(slice(col("qv"), 1, 16), x => x.cast("long")).as("p"))
    val cells = q.select(explode(flatten(
        transform(sequence(lit(1), lit(16)), i =>
          transform(sequence(i, lit(16)), j =>
            struct(i.cast("long").as("i"), j.cast("long").as("j"),
              (element_at(col("p"), i) * element_at(col("p"), j))
                .as("v")))))).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.v")).as("gram"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(cells.size == 16 * 17 / 2)
    assert(cells((1L, 1L)) == 127L * 127 * 2)
    assert(cells((1L, 2L)) == 127L * 2 + 127L * 5)
    assert(cells((1L, 3L)) == 127L * 3 + 127L * 7)
    assert(cells((2L, 2L)) == 4L + 25L)
    assert(cells((2L, 3L)) == 6L + 35L)
    assert(cells((3L, 3L)) == 9L + 49L)
    // every cell touching a zero dimension is exactly zero
    assert(cells.count { case (_, g) => g != 0L } == 6, cells.toString)
    // no lower-triangle duplicates
    assert(cells.keys.forall { case (i, j) => i <= j })
  }

  test("filteredKnnDeficit: pre-filter always fills k, and the deficit " +
    "is exactly the same-label shortfall of the GLOBAL top-k " +
    "(cross-checked against an independent window-ranking replay)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Similarity.filteredKnnDeficit(
        emb.filter(col("vec_id") < 8), emb, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 8, s"one row per query: ${out.length}")
    out.foreach { case (qid, pre, post, deficit) =>
      assert(pre == 10L, s"q$qid: ~50 same-label candidates must fill k")
      assert(post >= 0L && post <= pre, s"q$qid post=$post")
      assert(deficit == pre - post, s"q$qid deficit mismatch")
    }
    // independent replay of the post branch: global window top-10,
    // then count label matches per query
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val globalTopK = Similarity.rankTopKWindow(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").as("qv"), col("label").as("qlabel"))
        .crossJoin(emb.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv")))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", round(
          VectorExpressions.cosineSim(col("qv"), col("cv")), 4)), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = globalTopK.groupBy(_._1).map { case (q, rows) =>
      q -> rows.count { case (_, n) => labels(n) == labels(q) }.toLong
    }
    out.foreach { case (qid, _, post, _) =>
      assert(post == expected(qid),
        s"q$qid: post=$post vs window replay ${expected(qid)}")
    }
  }

  test("ivfRecallCurve: one row per swept nprobe, hits monotone " +
    "non-decreasing, full probe exactly recovers brute force, and the " +
    "theorem audit is empty") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 20)
    val curve = Similarity.ivfRecallCurve(
      qs, emb, 10, nlist = 16, nprobes = Seq(1, 2, 4, 16))
    val rows = curve.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.length == 4, rows.toSeq.toString)
    assert(rows.forall(_._2 == rows.head._2),
      "the exact reference is probe-independent")
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._3 <= hi._3, s"recall must not drop: $lo -> $hi")
    }
    assert(rows.last._3 == rows.last._2,
      "nprobe = nlist must recover every exact neighbor")
    assert(Similarity.recallCurveViolations(curve, 16).count() == 0)
  }

  test("e26 two-stage rescore: int8 candidate depth 50 contains the " +
    "exact top-10 on the fixture, so the rescored ranking equals " +
    "brute force row for row — the property that licenses serving " +
    "from the compressed corpus") {
    val emb = Tables.t(spark, sf, "embeddings")
    val staged = QueryCatalog.byName("e26_two_stage_rescore")
      .build(spark, sf)
      .select("query_id", "neighbor_id", "rn")
    val exact = Similarity
      .bruteForceTopK(emb.filter(col("vec_id") < 3), emb, 10)
      .select("query_id", "neighbor_id", "rn")
    assert(staged.exceptAll(exact).isEmpty &&
      exact.exceptAll(staged).isEmpty,
      "two-stage must reproduce the exact ranking at this depth")
  }
}