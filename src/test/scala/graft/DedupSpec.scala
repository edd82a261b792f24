package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup quality tests promised by the Dedup scaladoc: LSH candidate
  * recall measured against a brute-force exact-jaccard oracle on the
  * sf0.001 documents fixture. */
class DedupSpec extends SparkSpec {

  private lazy val docs: DataFrame =
    Tables.t(spark, sf, "documents").limit(200).cache()

  /** Brute-force all-pairs exact jaccard over 3-gram shingle hash sets
    * (the oracle LSH must approximate). */
  private def brutePairs(minJac: Double): Set[(Long, Long)] = {
    val sets = Dedup.minhashPrep(docs, 3, 16).select("doc_id", "shh")
    sets.alias("l").join(sets.alias("r"),
        col("l.doc_id") < col("r.doc_id"))
      .withColumn("jac",
        size(array_intersect(col("l.shh"), col("r.shh"))).cast("double") /
          size(array_union(col("l.shh"), col("r.shh"))))
      .filter(col("jac") >= minJac)
      .select(col("l.doc_id"), col("r.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("exact dedup groups cover every document exactly once") {
    val groups = Dedup.exactGroups(docs)
    assert(groups.agg(sum("n")).collect().head.getLong(0) == docs.count())
  }

  test("normalized dedup merges at least as much as exact dedup") {
    assert(Dedup.normalizedGroups(docs).count() <=
      Dedup.exactGroups(docs).count())
  }

  test("minhash pairs: every returned pair really has jaccard >= threshold " +
    "(verify stage is exact)") {
    val exact = brutePairs(0.5)
    val got = Dedup.minhashNearDupPairs(docs, 3, 16, 4, 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))
  }

  test("CDC chunking: chunk identity is insertion-shift-invariant — a " +
    "front insertion leaves every post-boundary chunk shared (fixed " +
    "windows would shift and miss all of them)") {
    val sq = spark; import sq.implicits._
    // 'gamma' and 'nu' are boundary tokens (md5 starts with '0'), so the
    // base text deterministically splits into >= 3 chunks
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (1L, base),
      (2L, "inserted prefix tokens " + base), // shifts every fixed window
      (3L, "a completely different document about other things"))
      .toDF("doc_id", "text")
    val dups = Dedup.cdcChunkDups(docs).collect()
    // chunks starting at the first boundary AFTER the insertion are
    // byte-identical between docs 1 and 2
    assert(dups.nonEmpty, "post-boundary chunks must be shared")
    assert(dups.forall(_.getLong(1) == 2), "only docs 1+2 share chunks")
    // determinism: same input, same table
    val again = Dedup.cdcChunkDups(docs).collect()
    assert(dups.map(_.getString(0)).sorted.toSeq ==
      again.map(_.getString(0)).sorted.toSeq)
  }

  test("CDC chunking: the map-side per-row fold equals the windowed " +
    "explode formulation row-for-row on the real corpus") {
    val docs = Tables.t(spark, sf, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sorted.toSeq
    assert(rows(Dedup.cdcChunks(docs)) ==
      rows(Dedup.cdcChunksWindowed(docs)))
  }

  test("minhash recall >= 0.95 at high similarity (bands=8: " +
    "P[candidate | j>=0.9] ~ 1 - 0.19^8)") {
    val exact = brutePairs(0.9)
    assert(exact.nonEmpty, "fixture should contain near-dup documents")
    val got = Dedup.minhashNearDupPairs(docs, 3, 16, 8, 0.9)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall over ${exact.size} true pairs")
  }

  test("exact jaccard pairs (d07) EQUAL the brute-force all-pairs set — " +
    "the inverted-index candidates are exhaustive, not probabilistic") {
    val exact = brutePairs(0.8)
    val got = Dedup.exactJaccardPairs(docs, 3, 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact,
      s"missing=${(exact -- got).take(3)} spurious=${(got -- exact).take(3)}")
  }

  test("duplicateClusters equals a sequential union-find transitive " +
    "closure (singletons keep themselves; chains collapse to one rep)") {
    val pairs = Dedup.exactJaccardPairs(docs, 3, 0.8)
    val edgeList = pairs.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    // driver-side union-find oracle on the tiny fixture
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = Dedup.duplicateClusters(pairs, docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.count { case (id, rep) => id == rep } ==
      expected.values.toSet.size, "keepers = one per cluster")
  }

  test("minhash plan: skew cap is aggregate+anti-join, NOT a window sort " +
    "over the hot bucket") {
    val plan = Dedup.minhashNearDupPairs(docs, 3, 16, 4, 0.5)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition"),
      "bucket cap must not buffer the degenerate bucket in one window task")
  }

  test("simhash: identical docs have hamming 0; returned pairs respect " +
    "the bound") {
    val pairs = Dedup.simhashNearDupPairs(docs, maxHamming = 7, chunks = 8)
    assert(pairs.filter(col("hamming") > 7).count() == 0)
    // exact duplicates (if any) must always be found: hamming 0 passes
    // every chunk-equality band
    val exactDups = Dedup.exactGroups(docs).filter(col("n") > 1).count()
    if (exactDups > 0)
      assert(pairs.filter(col("hamming") === 0).count() > 0)
  }

  test("native simhash64 expression is bit-identical to the HOF " +
    "formulation on the full fixture") {
    val all = Tables.t(spark, sf, "documents")
    val toks = TextFunctions.tokens(col("text"))
    val diff = all.select(
        TextExpressions.simhash64(toks).as("native"),
        TextFunctions.simhash64(TextFunctions.tokenHashes(toks)).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
    // edge cases via the registered SQL name (ExecutionContext registry):
    // empty token array -> 0; null array -> null
    new ExecutionContext(spark)
    val row = spark.sql(
      "SELECT simhash64(CAST(array() AS ARRAY<STRING>)) AS e, " +
        "simhash64(CAST(NULL AS ARRAY<STRING>)) AS n")
      .collect().head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
  }

  test("native minhash_sig expression is bit-identical to the HOF " +
    "formulation on the full fixture (incl. empty/null arrays)") {
    val all = Tables.t(spark, sf, "documents")
    val shh = TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 3)
    val diff = all.select(
        TextExpressions.minhashSig(shh, 16).as("native"),
        TextFunctions.minhashSignature(shh, 16).as("hof"))
      .filter(not(col("native") === col("hof")))
    assert(diff.count() == 0)
    val sq = spark; import sq.implicits._
    val edge = Seq(Tuple1(Seq.empty[Long]))
      .toDF("shh")
      .select(
        TextExpressions.minhashSig(col("shh"), 4).as("e"),
        TextExpressions.minhashSig(lit(null).cast("array<bigint>"), 4).as("n"))
      .collect().head
    assert(edge.getSeq[Long](0) == Seq.fill(4)(Long.MaxValue))
    assert(edge.isNullAt(1))
  }

  test("native shingle_hashes expression is bit-identical to the HOF " +
    "formulation on the full fixture (incl. sub-n docs, empty, null)") {
    val all = Tables.t(spark, sf, "documents")
    val toks = TextFunctions.tokens(col("text"))
    val diff = all.select(
        TextExpressions.shingleHashes(toks, 3).as("native"),
        TextFunctions.shingleHashes(toks, 3).as("hof"))
      .filter(not(col("native") === col("hof")))
    assert(diff.count() == 0)
    val sq = spark; import sq.implicits._
    // 1- and 2-token docs exercise the zip_with null-padding fold steps
    val edges = Seq("one", "two words", "", "a b c d").toDF("text")
    val ediff = edges.select(
        TextExpressions.shingleHashes(TextFunctions.tokens(col("text")), 3)
          .as("native"),
        TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 3)
          .as("hof"))
      .filter(not(col("native") === col("hof")))
    assert(ediff.count() == 0)
    assert(edges.limit(1).select(TextExpressions.shingleHashes(
      lit(null).cast("array<string>"), 3)).collect().head.isNullAt(0))
  }

  test("shingle_hashes_all keeps every window in position order; its " +
    "first-occurrence distinct equals shingle_hashes; window count = " +
    "greatest(len-n+1, 1)") {
    val all = Tables.t(spark, sf, "documents")
    val toks = TextFunctions.tokens(col("text"))
    val diff = all.select(
        TextExpressions.shingleHashesAll(toks, 3).as("m"),
        TextExpressions.shingleHashes(toks, 3).as("d"),
        size(toks).as("n"))
      .filter(not(array_distinct(col("m")) === col("d")) ||
        size(col("m")) =!= greatest(size(toks) - 2, lit(1)))
    assert(diff.count() == 0)
    // SQL registration (both install paths share the registry entries)
    val sq = new ExecutionContext(spark)
    val viaSql = sq.execute(
      "SELECT size(shingle_hashes_all(array('a','b','a','b'), 2)) AS n," +
        " size(shingle_hashes(array('a','b','a','b'), 2)) AS nd")
      .collect().head
    assert(viaSql.getInt(0) == 3 && viaSql.getInt(1) == 2) // ab ba ab / ab ba
  }

  test("embedding near-dup pairs are symmetric-free (a < b) and above " +
    "threshold") {
    val emb = Tables.t(spark, sf, "embeddings").limit(200)
    val pairs = Dedup.embeddingNearDupPairs(emb, threshold = 0.2,
      signBits = 4)
    assert(pairs.filter(col("a") >= col("b")).count() == 0)
    assert(pairs.filter(col("cos") < 0.2).count() == 0)
  }

  test("embedding near-dup candidates are sub-quadratic: multi-probe " +
    "fraction ~ (bits+1)/2^bits of all pairs, halving per +1 bit") {
    val emb = Tables.t(spark, sf, "embeddings").limit(200)
    val n = emb.count()
    val allPairs = n * (n - 1) / 2.0
    val cand4 = Dedup.signBucketCandidates(emb, 4, multiProbe = true).count()
    // expected 5/16 ~ 0.31; assert well below all-pairs (the d06 entry
    // must never silently degrade to quadratic)
    assert(cand4 / allPairs <= 0.45,
      s"candidate fraction ${cand4 / allPairs} at 4 bits")
    // the scale knob works: more bits => fewer candidates
    val cand6 = Dedup.signBucketCandidates(emb, 6, multiProbe = true).count()
    assert(cand6 < cand4,
      s"6-bit candidates $cand6 not below 4-bit $cand4")
  }

  test("adaptiveSignBits holds bucket occupancy constant: bits grow " +
    "with log2(n) and clamp at the floor/ceiling") {
    def bits(n: Int) =
      Dedup.adaptiveSignBits(spark.range(n.toLong).toDF("vec_id"))
    assert(bits(100) == 4)     // below the floor: clamps to 4
    assert(bits(2000) == 4)    // the fixture geometry is unchanged
    assert(bits(20000) == 8)   // the sf1 scale run: 256 buckets
    assert(bits(200000) == 11) // keeps growing with the corpus
    assert(Dedup.adaptiveSignBits(
      spark.range(1000000L).toDF("v"), perBucket = 1, maxBits = 24) == 20)
  }

  test("all five native expressions evaluate inside WholeStageCodegen " +
    "spans (starred operators), not interpreted fallback") {
    val docs = Tables.t(spark, sf, "documents").limit(10)
    val emb = Tables.t(spark, sf, "embeddings").limit(10)
    val toks = TextFunctions.tokens(col("text"))
    val textPlan = docs.select(
        TextExpressions.simhash64(toks),
        TextExpressions.minhashSig(TextExpressions.shingleHashes(toks, 3), 8))
      .queryExecution.executedPlan.toString
    // raw float arrays: a toDouble (`transform`) wrapper is a
    // CodegenFallback HOF that would break the projection out of codegen
    val vecPlan = emb.select(
        VectorExpressions.cosineSim(col("embedding"), col("embedding")),
        Similarity.signBucket(col("embedding"), 4))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators compiled into a codegen stage
    assert(textPlan.contains("*(1) Project") &&
      textPlan.contains("simhash64") && textPlan.contains("minhash_sig") &&
      textPlan.contains("shingle_hashes"), s"text plan:\n$textPlan")
    assert(vecPlan.contains("*(1) Project") &&
      vecPlan.contains("sign_bucket"), s"vec plan:\n$vecPlan")
  }

  test("pipeline-persisted frames are tracked and released by " +
    "ManagedCache.releaseAll") {
    ManagedCache.releaseAll()
    Dedup.minhashNearDupPairs(docs, 3, 16, 4, 0.5).count()
    assert(ManagedCache.trackedCount > 0,
      "minhash pipeline should register its persisted prep frames")
    ManagedCache.releaseAll()
    assert(ManagedCache.trackedCount == 0)
  }

  test("incremental exact jaccard equals the full self-join's cross-split " +
    "pairs (orientation-normalized) and finds nothing within-split") {
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val rest = docs.filter(col("doc_id") % 10 =!= 0)
    val inc = Dedup.incrementalExactJaccard(delta, rest, 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    ManagedCache.releaseAll()
    // full all-pairs run, restricted to pairs that CROSS the split and
    // re-oriented so the delta id comes first
    val full = Dedup.exactJaccardPairs(docs, 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 10 == 0) != (b % 10 == 0) }
      .map { case (a, b, j) => if (a % 10 == 0) (a, b, j) else (b, a, j) }
      .toSet
    ManagedCache.releaseAll()
    assert(inc == full)
    assert(full.nonEmpty,
      "fixture should contain at least one cross-split near-dup pair")
  }

  test("incremental minhash recall vs incremental exact pairs, and every " +
    "returned pair is verified-exact") {
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val rest = docs.filter(col("doc_id") % 10 =!= 0)
    val exact = Dedup.incrementalExactJaccard(delta, rest, 3, 0.5)
      .select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ManagedCache.releaseAll()
    // bands=8 (rows=2): the same high-recall banding as the self-join spec
    val got = Dedup.incrementalMinhashPairs(delta, rest, 3, 16,
      bands = 8, threshold = 0.5)
      .select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    ManagedCache.releaseAll()
    assert(got.subsetOf(exact),
      "verify stage must keep only pairs whose exact jaccard >= threshold")
    assert(exact.nonEmpty)
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall over ${exact.size} true pairs")
  }

  test("dedup index save/load round trip: a delta joined against the " +
    "LOADED corpus index returns exactly the live-path pairs without " +
    "re-shingling the corpus") {
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val rest = docs.filter(col("doc_id") % 10 =!= 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("new_id", "old_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val live = pairs(Dedup.incrementalMinhashPairs(delta, rest, 3, 16,
      bands = 8, threshold = 0.5))
    ManagedCache.releaseAll()
    val path = java.nio.file.Files
      .createTempDirectory("dedup_idx").toString + "/idx"
    Dedup.saveDedupIndex(path, rest, shingleN = 3, k = 16)
    val loaded = Dedup.loadDedupIndex(spark, path)
    val served = pairs(Dedup.incrementalMinhashAgainstPrep(delta, loaded,
      3, 16, bands = 8, threshold = 0.5))
    ManagedCache.releaseAll()
    assert(served == live)
    assert(live.nonEmpty)
  }

  test("removeBoilerplate drops cross-doc repeated lines, keeps unique " +
    "ones in order, and keeps all-boilerplate docs with empty text") {
    val sq = spark; import sq.implicits._
    val banner = "subscribe to our newsletter"
    val footer = "all rights reserved"
    val corpus = Seq(
      (1L, s"$banner\nunique first line\nsecond thought\n$footer"),
      (2L, s"$banner\nanother original sentence\n$footer"),
      (3L, s"$banner\ncompletely different content here\n$footer"),
      (4L, s"$banner\n$footer"), // nothing original: must survive, empty
      (5L, "a lone document with its own words")
    ).toDF("doc_id", "text")
    // banner+footer sit in 4/5 docs (80% > 50%); every other line is
    // unique (20% <= 50%)
    val out = Dedup.removeBoilerplate(Dedup.lineSegments(corpus), 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    ManagedCache.releaseAll()
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, "unique first line second thought"),
      (2L, 3L, 1L, "another original sentence"),
      (3L, 3L, 1L, "completely different content here"),
      (4L, 2L, 0L, ""),
      (5L, 1L, 1L, "a lone document with its own words")))
  }

  test("removeBoilerplate plan shape: no cartesian, segment frequency " +
    "threshold is a corpus fraction (d11 binding drops segments on the " +
    "real corpus)") {
    val out = q("d11_boilerplate").build(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
    val rows = out.collect()
    ManagedCache.releaseAll()
    // the fixture has repeated 2-token windows: the filter must actually
    // fire somewhere (guards against a vacuous always-keep binding)
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "expected at least one dropped boilerplate segment on the fixture")
    // and reassembly keeps every fully-unique doc intact
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("duplicatedSpans finds the shared passage at its exact positions, " +
    "ignores intra-doc repetition, and skips short docs") {
    val sq = spark; import sq.implicits._
    val passage = (1 to 9).map(i => s"s$i").mkString(" ") // 9 shared tokens
    val corpus = Seq(
      (1L, s"a1 a2 $passage a3"),       // passage at token positions 3..11
      (2L, s"$passage b1 b2 b3"),       // passage at token positions 1..9
      (3L, (1 to 12).map(i => s"c$i").mkString(" ")), // unique -> no rows
      // intra-doc repeat only: the "d1..d8" gram occurs twice in ONE doc;
      // the distinct-doc filter must exclude it
      (4L, ((1 to 8) ++ (1 to 8)).map(i => s"d$i").mkString(" ")),
      (5L, "too short")                 // < 8 tokens -> emits nothing
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(corpus, n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    ManagedCache.releaseAll()
    // 9 shared tokens -> two 8-gram starts merge into ONE maximal span
    assert(got == Set(
      (1L, 3L, 11L, 9L, 2L),
      (2L, 1L, 9L, 9L, 2L)))
    // removal drops exactly the shared passage from BOTH carriers and
    // passes every other doc through intact (incl. the intra-doc repeat)
    val clean = Dedup.removeDuplicatedSpans(corpus, n = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    ManagedCache.releaseAll()
    assert(clean(1L) == ((12L, 3L, "a1 a2 a3")))
    assert(clean(2L) == ((12L, 3L, "b1 b2 b3")))
    assert(clean(3L)._1 == clean(3L)._2) // untouched
    assert(clean(4L)._1 == clean(4L)._2) // intra-doc repeat kept
    assert(clean(5L) == ((2L, 2L, "too short")))
  }

  test("normalizedUrl canonicalizes scheme/www/case/trailing-slash/" +
    "tracking-param/fragment variants to ONE key and keeps real params") {
    val sq = spark; import sq.implicits._
    val urls = Seq(
      (1L, "https://example.com/page/7"),
      (2L, "http://www.Example.COM/page/7/"),
      (3L, "https://example.com/page/7?utm_source=a&utm_campaign=b"),
      (4L, "https://example.com/page/7?id=9&utm_medium=c#frag"),
      (5L, "https://example.com/page/7?utm_source=a&id=9&ref=rss"),
      (6L, "https://other.example.net/x?a=1&b=2")
    ).toDF("doc_id", "url")
    val got = urls.select(col("doc_id"),
      Dedup.normalizedUrl(col("url")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // scheme, www, host case, trailing slash and all-tracking queries
    // all fold into the clean form
    assert(got(1L) == "example.com/page/7")
    assert(got(2L) == "example.com/page/7")
    assert(got(3L) == "example.com/page/7")
    // a real param survives (fragment and tracking params around it drop)
    assert(got(4L) == "example.com/page/7?id=9")
    assert(got(5L) == "example.com/page/7?id=9")
    // multi-param non-tracking queries pass through whole
    assert(got(6L) == "other.example.net/x?a=1&b=2")
  }

  test("d17 url dedup keeps exactly one doc per canonical url and marks " +
    "every member of the collapsed variant families") {
    val df = q("d17_url_dedup").build(spark, sf)
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    // exactly one keeper per canonical key, and it is the min doc_id
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.count(_._3) == 1)
      assert(g.filter(_._3).head._1 == g.map(_._1).min)
    }
    // families 0-2 of one page id share a key; family 3 has its own
    rows.filter(_._1 % 4 != 3).foreach { case (d, k, _) =>
      assert(k == s"example.com/page/${d % 50}", s"doc $d")
    }
    rows.filter(_._1 % 4 == 3).foreach { case (d, k, _) =>
      assert(k == s"example.com/page/${d % 50}?id=${d % 50}", s"doc $d")
    }
  }

  test("md5 simhash signature matches a hand-computed reference on a " +
    "tiny doc (independent of Spark's md5/conv/shift expressions)") {
    val sq = spark; import sq.implicits._
    def h60(w: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15),
      16)
    // tf-weighted: 'alpha' votes with weight 2, 'beta' with 1, so every
    // bit where they disagree resolves to alpha's bit; ties impossible
    // (weights 2+1), strict-majority still exercised via the +3/-3 bits
    val terms = Seq(("alpha", 2L), ("beta", 1L))
    var want = 0L
    for (j <- 0 until 60) {
      val s = terms.map { case (w, c) =>
        if (((h60(w) >> j) & 1L) == 1L) c else -c }.sum
      if (s > 0) want |= (1L << j)
    }
    val got = Dedup.md5SimHashSignatures(
      Seq((1L, "alpha alpha beta")).toDF("doc_id", "text"))
      .collect().head.getLong(1)
    assert(got == want)
  }

  test("normalizedUrl is idempotent over generated URLs (normalizing an " +
    "already-canonical key is a no-op — the property that lets a " +
    "frontier re-normalize opportunistically without corrupting keys)") {
    val sq = spark; import sq.implicits._
    import org.scalacheck.{Gen, rng}
    val scheme = Gen.oneOf("http", "https")
    val host = for {
      www <- Gen.oneOf("", "www.", "WWW.")
      h <- Gen.oneOf("Example.COM", "example.org", "a.b.example.net")
    } yield www + h
    val path = Gen.oneOf("", "/", "/x", "/x/y/", "/page/7")
    val query = Gen.oneOf("", "?utm_source=a", "?id=9",
      "?id=9&utm_medium=m", "?a=1&b=2", "?ref=x&fbclid=z")
    val frag = Gen.oneOf("", "#frag")
    val url = for {
      s <- scheme; h <- host; p <- path; q <- query; f <- frag
    } yield s"$s://$h$p$q$f"
    val seed0 = rng.Seed(42L)
    val urls = Iterator.iterate((seed0, List.empty[String])) {
      case (sd, acc) =>
        val r = url.pureApply(Gen.Parameters.default, sd)
        (sd.next, r :: acc)
    }.drop(200).next()._2
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    val once = Dedup.normalizedUrl(col("url"))
    val rows = df.select(col("id"), once.as("n1"),
        // re-normalize the canonical key with a scheme re-attached (the
        // key drops the scheme, so round-trip through a synthetic one)
        Dedup.normalizedUrl(concat(lit("https://"), once)).as("n2"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"not idempotent for ${urls(r.getLong(0).toInt)}: " +
          s"'${r.getString(1)}' vs '${r.getString(2)}'")
    }
  }

  test("containment catches a quoted-subset pair that jaccard misses " +
    "(asymmetric near-dup), and only in the contained->container " +
    "direction") {
    val sq = spark; import sq.implicits._
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, 3, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0)),
      s"short doc is fully contained in long, never the reverse: " +
        cont.toSeq.toString)
    // the SYMMETRIC gate does not flag this pair at any near-dup
    // threshold: jaccard = |A|/|B| = 4/44
    val jac = Dedup.exactJaccardPairs(df, 3, 0.5).collect()
    assert(jac.isEmpty, "jaccard must miss the quoted-subset pair")
  }

  test("md5 minhash-lsh pipeline: identical docs collide in every band " +
    "and verify at jac 1.0; a disjoint doc pairs with nothing") {
    val sq = spark; import sq.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words with no shared shingles at all"))
      .toDF("doc_id", "text")
    val sig = Dedup.md5MinHashSignatures(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical docs -> identical signatures on every seed
    assert(sig.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet ==
      sig.filter(_._1 == 2L).map(t => (t._2, t._3)).toSet)
    assert(sig.count(_._1 == 1L) == 8)
    val pairs = Dedup.md5MinHashBandedPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)), pairs.toSeq.toString)
  }

  test("md5 simhash banded pairs equal the brute-force hamming scan " +
    "(pigeonhole banding is lossless at radius 5 / 6 chunks)") {
    val sig = Dedup.md5SimHashSignatures(docs).cache()
    val brute = sig.alias("l").join(sig.alias("r"),
        col("l.doc_id") < col("r.doc_id"))
      .withColumn("hamming",
        bit_count(col("l.sim60").bitwiseXOR(col("r.sim60"))).cast("long"))
      .filter(col("hamming") <= 5)
      .select(col("l.doc_id"), col("r.doc_id"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Dedup.md5SimHashPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    sig.unpersist()
    assert(banded == brute)
  }

  test("bloom decontamination equals the exact gram join (bloom has no " +
    "false negatives), and the prefilter actually prunes the train side") {
    val d = Tables.t(spark, sf, "documents")
    val split = d.withColumn("split",
      Sampling.deterministicSplit(col("text")))
    def grams(df: DataFrame) = df.select(col("doc_id"),
      explode(TextExpressions.shingleHashes(
        TextFunctions.tokens(col("text")), 8)).as("g"))
    val trainG = grams(split.filter(col("split") === "train"))
      .select("g").distinct().cache()
    val testG = grams(split.filter(col("split") === "test")).cache()
    // exact twin of the whole operator (p02's plan)
    val exact = testG.join(trainG, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Dedup.bloomDecontaminate(d, expectedItems = 1L << 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    val testIds = split.filter(col("split") === "test")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomed.keySet == testIds)
    bloomed.foreach { case (id, (n, flag)) =>
      assert(n == exact.getOrElse(id, 0L), s"doc $id")
      assert(flag == (n > 0))
    }
    // prefilter contract: candidates are a SUPERSET of the truly shared
    // grams (one-sided bloom guarantee) and — on a corpus where most
    // train grams are NOT in the test split — a strict subset of the
    // train grams (the pruning that makes the two-phase plan cheap).
    val bloom = testG.agg(
      BloomFunctions.bloomAgg(col("g"), 1L << 20).as("bf"))
    val cand = trainG.filter(BloomFunctions.mightContain(
      org.apache.spark.sql.GraftBridge.scalarSubquery(bloom), col("g")))
      .cache()
    val shared = trainG.join(testG.select("g").distinct(), "g")
    assert(cand.join(shared, "g").count() == shared.count(),
      "bloom candidates must contain every truly shared gram")
    assert(cand.count() < trainG.count(),
      "bloom prefilter should prune non-matching train grams")
    cand.unpersist(); trainG.unpersist(); testG.unpersist()
  }

  test("d24 prefix-filtered jaccard equals the full inverted-index " +
    "join on a boilerplate-heavy corpus, and the rational prefix " +
    "boundary matches the exact ceiling by construction") {
    val sq = spark; import sq.implicits._
    // every doc shares an identical boilerplate tail (the highest-df
    // shingles, which the canonical df-order pushes OUT of every
    // prefix); docs 1/2 are true near-dups, 3/4 share only boilerplate
    val boiler = "subscribe to our newsletter terms apply all rights"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (2L, s"alpha beta gamma delta epsilon zeta $boiler extra"),
      (3L, s"one two three four five six seven eight nine $boiler"),
      (4L, s"red green blue cyan magenta yellow black $boiler"))
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs(Dedup.exactJaccardPairs(docs, 3, 0.8))
    val pref = pairs(Dedup.prefixJaccardPairs(docs, 3, 4, 5))
    assert(pref == full, s"prefix=$pref full=$full")
    assert(full.map(p => (p._1, p._2)) == Set((1L, 2L)),
      s"fixture should pair exactly the true near-dups: $full")
    // the rational boundary is ⌈4·sz/5⌉ by construction — property-
    // check it against the mathematical ceiling over a size sweep
    // (the float form happens to agree at these thresholds, but only
    // by rounding luck; the div form cannot drift by definition)
    val sweep = spark.range(1, 2000).select(
      col("id").as("sz"),
      expr("(id * 4 + 4) div 5").as("got"),
      // independent exact form: ceiling over DECIMAL division
      expr("CAST(ceil(CAST(id * 4 AS DECIMAL(20,0)) / 5) AS BIGINT)")
        .as("want"))
    assert(sweep.filter(col("got") =!= col("want")).count() == 0)
  }

  test("d23 prefix blocking pairs tail edits within distance 2, and a " +
    "HEAD edit lands in a different block — the documented miss the " +
    "second blocking pass exists for") {
    val sq = spark; import sq.implicits._
    val docs = Seq(
      (2L, "alpha beta gamma filler words here"),  // even: title as-is
      (4L, "alpha beta gamma other tail words"),   // even: identical title
      (3L, "alpha beta gamma junk junk junk"),     // odd: title + ' x'
      (6L, "zleph beta gamma words words words"))  // HEAD typo: new block
      .toDF("doc_id", "text")
    val base = docs
      .select(col("doc_id"), array_join(
        slice(TextFunctions.tokens(col("text")), 1, 3), " ").as("t0"))
      .withColumn("title",
        when(col("doc_id") % 2 === 1, concat(col("t0"), lit(" x")))
          .otherwise(col("t0")))
      .withColumn("blk", substring(col("title"), 1, 4))
    def pairsWith(dist: org.apache.spark.sql.Column,
        keep: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      base.as("a").join(base.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.doc_id") < col("b.doc_id"))
        .withColumn("dist", dist)
        .filter(keep(col("dist")))
        .select(col("a.doc_id"), col("b.doc_id"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
    // the entry's early-exit threshold form…
    val pairs = pairsWith(
      levenshtein(col("a.title"), col("b.title"), 2), _ >= 0)
    // …must equal the unbounded distance + filter it optimizes
    assert(pairs == pairsWith(
      levenshtein(col("a.title"), col("b.title")), _ <= 2))
    // exact pair (2,4), two tail-edit pairs at distance 2; doc 6's
    // head-mutated title shares no 4-char prefix -> correctly absent
    assert(pairs == Set((2L, 3L, 2), (2L, 4L, 0), (3L, 4L, 2)),
      pairs.toString)
  }
}
