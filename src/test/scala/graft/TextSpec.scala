package graft

import org.apache.spark.sql.functions._
import TextFunctions._

/** Language-ID accuracy + tokenizer/fingerprint determinism (promised by
  * the TextQueries scaladoc). */
class TextSpec extends SparkSpec {

  private lazy val docs = Tables.t(spark, sf, "documents").cache()

  test("tokenizers agree with hand counts") {
    val sq = spark; import sq.implicits._
    val df = Seq(("Hello, world 123", 0)).toDF("text", "x")
    val row = df.select(
      tokenCountWs(col("text")).as("ws"),
      tokenCountBpe(col("text")).as("bpe")).collect().head
    assert(row.getLong(0) == 3L)  // [hello,] [world] [123]
    assert(row.getLong(1) == 4L)  // [Hello][,][world][123]
  }

  test("langId classifies real per-language prose correctly (the synthetic " +
    "corpus text is language-agnostic, so its lang label is untestable)") {
    val sq = spark; import sq.implicits._
    val samples = Seq(
      ("en", "the cat sat of the mat and it is you that said to go in"),
      ("de", "der hund und die katze das ist nicht mit einem ich zu haus"),
      ("es", "el perro y la casa que es en un ser no se los dias"),
      ("fr", "le chien et la maison pour un dans ce une les beaux des jours"),
      ("zh", "我 是 不 了 在 人 有 他 的 一 好"))
      .toDF("lang", "text")
    val preds = samples
      .select(col("lang"), langId(tokens(col("text"))).as("pred"))
      .collect()
    preds.foreach(r =>
      assert(r.getString(0) == r.getString(1),
        s"expected ${r.getString(0)}, predicted ${r.getString(1)}"))
  }

  test("langId is deterministic over the whole corpus") {
    val a = docs.select(langId(tokens(col("text"))).as("p"))
      .collect().map(_.getString(0)).toSeq
    val b = docs.select(langId(tokens(col("text"))).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(a == b)
  }

  test("fingerprint is deterministic and order-sensitive") {
    val sq = spark; import sq.implicits._
    val a = docs.select(fingerprint(tokens(col("text"))).as("fp")).collect()
    val b = docs.select(fingerprint(tokens(col("text"))).as("fp")).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    // order sensitivity: reversed token stream fingerprints differently
    val df = Seq(("alpha beta gamma", "gamma beta alpha")).toDF("x", "y")
    val row = df.select(
      fingerprint(tokens(col("x"))).as("fx"),
      fingerprint(tokens(col("y"))).as("fy")).collect().head
    assert(row.getLong(0) != row.getLong(1))
  }

  test("quality score stays in [0, 1] and rewards prose over junk") {
    val sq = spark; import sq.implicits._
    val bounds = docs
      .select(qualityScore(col("text"), tokens(col("text"))).as("q"))
      .agg(min("q"), max("q")).collect().head
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
    val df = Seq((
      "The quick brown fox jumps over the lazy dog near the quiet river " +
        "while morning light settles on the water and birds begin to sing",
      "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@ #### $$$$"))
      .toDF("good", "junk")
    val row = df.select(
      qualityScore(col("good"), tokens(col("good"))).as("g"),
      qualityScore(col("junk"), tokens(col("junk"))).as("j")).collect().head
    assert(row.getDouble(0) > row.getDouble(1))
  }

  test("stopwordHits counts membership, case-normalized") {
    val sq = spark; import sq.implicits._
    val df = Seq(("The cat AND the dog", 0)).toDF("text", "x")
    val n = df.select(stopwordHits(tokens(col("text")), stopwords("en")))
      .collect().head.getLong(0)
    assert(n == 3L) // the, and, the
  }

  test("native stopword_count is value-identical to the HOF filter form " +
    "on the full fixture, for every language list") {
    val docs = Tables.t(spark, sf, "documents")
    val toks = tokens(col("text"))
    stopwords.foreach { case (lang, words) =>
      val diff = docs.select(
          stopwordHits(toks, words).as("native"),
          stopwordHitsHof(toks, words).as("hof"))
        .filter(col("native") =!= col("hof"))
      assert(diff.count() == 0, s"lang=$lang")
    }
  }

  test("chunking covers every character, chunks overlap by exactly 50, " +
    "and reassembling the non-overlapped prefixes rebuilds the document") {
    val chunks = q("t13_doc_chunking").build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val texts = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == texts.keySet)
    chunks.foreach { case (id, cs) =>
      val text = texts(id)
      // step-sized prefixes of each chunk + the full tail chunk = document
      val rebuilt = cs.init.map(_.take(150)).mkString + cs.last
      assert(rebuilt == text, s"doc $id reassembly")
      // consecutive chunks agree on the 50-char overlap
      cs.sliding(2).foreach {
        case Seq(a, b) if a.length == 200 =>
          assert(a.takeRight(50) == b.take(math.min(50, b.length)))
        case _ =>
      }
    }
  }

  test("repetition signals: a degenerate repeated-bigram doc maxes the " +
    "scores; an all-distinct doc floors them") {
    val sq = spark; import sq.implicits._
    val df = Seq(
      (1L, "spam ham spam ham spam ham spam ham"), // one bigram repeated
      (2L, "a b c d e f g h")) // every bigram/trigram distinct
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("rep_docs")
    val toks = tokens(col("text"))
    // same computation as t14, inlined over the synthetic frame
    def grams(n: Int) = transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ",
        (0 until n).map(j => element_at(toks, i + lit(j))): _*))
    val c2 = df.select(col("doc_id"), explode(grams(2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("top2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1: bigrams are (spam ham) x4 + (ham spam) x3 -> top frac 4/7
    assert(math.abs(c2(1L) - 4.0 / 7) < 1e-12)
    // doc 2: 7 distinct bigrams -> top frac 1/7
    assert(math.abs(c2(2L) - 1.0 / 7) < 1e-12)
  }

  test("decontamination flags exactly the test docs sharing an 8-gram " +
    "with some train doc (driver-recomputed ground truth)") {
    val docs = Tables.t(spark, sf, "documents")
      .withColumn("split", Sampling.deterministicSplit(col("text")))
    // ground truth on the tiny fixture: string 8-gram sets per doc
    def gramSet(text: String): Set[String] = {
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      (if (t.length < 8) Seq(t.mkString(" "))
       else t.sliding(8).map(_.mkString(" ")).toSeq).toSet
    }
    val rows = docs.select("doc_id", "text", "split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val trainGrams = rows.filter(_._3 == "train")
      .flatMap(r => gramSet(r._2)).toSet
    val expected = rows.filter(_._3 == "test")
      .map(r => r._1 -> (gramSet(r._2) & trainGrams).size.toLong).toMap
    val got = q("p02_decontamination").build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(expected.values.exists(_ > 0),
      "fixture should contain at least one contaminated test doc")
  }

  test("bigramPmi matches the hand-computed PMI and applies minCount") {
    val sq = spark; import sq.implicits._
    // corpus: "a b" x5, "c c c" x1
    //   bigrams: (a,b) x5, (c,c) x2   -> n2 = 7
    //   unigrams: a=5, b=5, c=3       -> n1 = 13
    //   PMI(a,b) = ln((5*13*13) / (7*5*5)) = ln(845/175)
    val docs = (Seq.fill(5)("a b") :+ "c c c").toDF("text")
    val rows = CorpusStats.bigramPmi(docs, minCount = 5).collect()
    assert(rows.length == 1, "only (a,b) reaches minCount=5")
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("a", "b", 5L))
    val expected = BigDecimal(math.log(845.0 / 175.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) == expected)
    ManagedCache.releaseAll()
  }

  test("sourceDrift: identically-distributed sources have KL 0; disjoint " +
    "half-and-half sources have KL ln(2)") {
    val sq = spark; import sq.implicits._
    // same distribution as the blend -> p == q -> KL = 0 for both
    val same = Seq(("sA", "x y"), ("sB", "x y x y")).toDF("source", "text")
    val kl0 = CorpusStats.sourceDrift(same).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(kl0 == Map("sA" -> 0.0, "sB" -> 0.0))
    ManagedCache.releaseAll()
    // disjoint vocabularies, equal mass: q_t = 1/2 within each source's
    // support -> KL = 1 * ln(1 / (1/2)) = ln 2 for both
    val split = Seq(("sA", "x x"), ("sB", "y y")).toDF("source", "text")
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val kl2 = CorpusStats.sourceDrift(split).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(kl2 == Map("sA" -> ln2, "sB" -> ln2))
    ManagedCache.releaseAll()
  }

  test("unigramLogLoss matches hand-computed cross-entropy and ranks the " +
    "out-of-distribution doc as the outlier") {
    val sq = spark; import sq.implicits._
    // corpus: doc 1 = "x x", doc 2 = "x y", doc 3 = "z z"
    //   unigrams: x=3, y=1, z=2, N=6
    //   H(1) = -(2 ln(3/6)) / 2 = ln 2
    //   H(2) = -(ln(3/6) + ln(1/6)) / 2
    //   H(3) = -(2 ln(2/6)) / 2 = ln 3
    val docs = Seq((1L, "x x"), (2L, "x y"), (3L, "z z"))
      .toDF("doc_id", "text")
    def r4(x: Double) = BigDecimal.decimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = CorpusStats.unigramLogLoss(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    ManagedCache.releaseAll()
    assert(got(1L) == ((2L, r4(math.log(2.0)))))
    assert(got(2L) == ((2L, r4(-(math.log(3.0 / 6) + math.log(1.0 / 6)) / 2))))
    assert(got(3L) == ((2L, r4(math.log(3.0)))))
    // the rare-vocab doc (2: contains the singleton 'y') scores worst
    assert(got(2L)._2 > got(1L)._2 && got(2L)._2 > got(3L)._2)
  }

  test("zipfFit matches the hand-computed OLS fit on a tiny vocabulary " +
    "and honors topN") {
    val sq = spark; import sq.implicits._
    // corpus: a=4, b=2, c=1 -> ranks 1,2,3 (tie-break irrelevant here)
    val docs = Seq("a a a a", "b b c").toDF("text")
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val mx = xs.sum / 3; val my = ys.sum / 3
    val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / 3
    val sxx = xs.map(x => (x - mx) * (x - mx)).sum / 3
    def r4(x: Double) = BigDecimal.decimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = CorpusStats.zipfFit(docs, topN = 100).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == r4(sxy / sxx))
    assert(r.getDouble(2) == r4(my - sxy / sxx * mx))
    // the fit on this near-Zipf corpus slopes downward
    assert(r.getDouble(1) < 0.0)
    // topN caps the fitted head: only ranks 1..2 enter the regression
    val r2 = CorpusStats.zipfFit(docs, topN = 2).collect().head
    assert(r2.getLong(0) == 2L)
    ManagedCache.releaseAll()
  }

  test("sourceVocabOverlap computes pairwise vocabulary jaccard and drops " +
    "disjoint pairs") {
    val sq = spark; import sq.implicits._
    val docs = Seq(("sA", "x y z"), ("sA", "x"), ("sB", "x y"), ("sC", "q"))
      .toDF("source", "text")
    val rows = CorpusStats.sourceVocabOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // sA={x,y,z} sB={x,y} sC={q}: only (sA,sB) overlaps — inter 2,
    // union 3; disjoint pairs (sA,sC)/(sB,sC) are absent by contract
    assert(rows == Map(("sA", "sB") -> ((3L, 2L, 2L, 0.6667))))
    ManagedCache.releaseAll()
  }

  test("corpus-stats plans honor their scaladoc: t16 broadcasts its 1-row " +
    "totals without a cartesian, and t17 explodes the corpus exactly once") {
    val pmiPlan = CorpusStats.bigramPmi(docs, minCount = 5)
      .queryExecution.executedPlan.toString
    // the 1-row totals are HINTED broadcasts (BNLJ cross, never a
    // CartesianProduct); the vocab-sized unigram joins deliberately carry
    // no hint (planner/AQE decides), so their join strategy is not pinned
    assert(pmiPlan.contains("BroadcastNestedLoopJoin"), s"plan:\n$pmiPlan")
    assert(!pmiPlan.contains("CartesianProduct"), s"plan:\n$pmiPlan")
    ManagedCache.releaseAll()
    val driftPlan = CorpusStats.sourceDrift(docs)
      .queryExecution.executedPlan.toString
    // The single persisted (source, term) aggregate feeds all four
    // consumers, so its build plan — holding THE one corpus explode — is
    // pretty-printed once per InMemoryTableScan. One distinct Generate
    // line (same expression ids everywhere) = one cached explode; four
    // independent re-derivations would carry four fresh expr-id sets.
    val generateLines = driftPlan.linesIterator
      .filter(_.contains("Generate explode"))
      .map(l => l.substring(l.indexOf("Generate"))).toSet
    assert(generateLines.size == 1,
      s"one distinct corpus explode expected, got $generateLines")
    // the source-cardinality totals join is a hinted broadcast
    assert(driftPlan.contains("BroadcastHashJoin"), s"plan:\n$driftPlan")
    assert(!driftPlan.contains("CartesianProduct"), s"plan:\n$driftPlan")
    ManagedCache.releaseAll()
  }

  test("approx_percentile — t09's documented 100 TB twin (mergeable rank " +
    "sketch, bounded memory) — lands within the interquartile range and " +
    "close to the exact median on every source") {
    val rows = Tables.t(spark, sf, "documents")
      .groupBy("source")
      .agg(
        percentile(col("n_chars"), lit(0.5)).as("exact_p50"),
        percentile(col("n_chars"), lit(0.25)).as("p25"),
        percentile(col("n_chars"), lit(0.75)).as("p75"),
        percentile_approx(col("n_chars"), lit(0.5), lit(1000))
          .cast("double").as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getDouble(1)
      val approx = r.getDouble(4) // an actual data point, not interpolated
      assert(approx >= r.getDouble(2) && approx <= r.getDouble(3),
        s"approx median $approx outside IQR for ${r.getString(0)}")
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx $approx vs exact $exact for ${r.getString(0)}")
    }
  }

  test("bpeMerges reproduces the hand-computed merge sequence on the " +
    "classic BPE example corpus (ties broken left-asc) and stops early " +
    "when words are fully merged") {
    val sq = spark; import sq.implicits._
    // Sennrich et al. (2016)'s illustrative vocabulary, as documents with
    // word multiplicity: low x5, lower x2, newest x6, widest x3.
    // Hand derivation: pair counts give (e,s)=9 tied with (s,t)=9 -> left
    // asc picks (e,s); then (es,t)=9; then (l,o)=7 tied with (o,w)=7 ->
    // (l,o); then (lo,w)=7.
    val corpus = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val got = CorpusStats.bpeMerges(corpus, nMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L),
      (3L, "l", "o", 7L), (4L, "lo", "w", 7L)))
    // early stop: a corpus whose words fully merge before nMerges rounds
    // must return only the feasible merges, not loop or pad
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val m2 = CorpusStats.bpeMerges(tiny, nMerges = 5).collect()
    assert(m2.length == 1 && m2(0).getString(1) == "a" &&
      m2(0).getString(2) == "b")
    ManagedCache.releaseAll()
  }

  test("redactPii replaces emails, phones, and IPv4s and leaves clean " +
    "text untouched") {
    val sq = spark; import sq.implicits._
    val rows = Seq(
      "write to jane.doe+spam@sub.example.org today",
      "call +44-207-9460 or +1-555-0133 now",
      "server at 192.168.0.1 and 10.0.255.17 up",
      "mixed: bob@x.io, +1-555-0000, 8.8.8.8",
      "nothing sensitive in this sentence at all",
      "not-an-email @ example dot com 1.2.3" // 3 octets: no IPv4 match
    ).toDF("t").select(TextFunctions.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq(
      "write to <EMAIL> today",
      "call <PHONE> or <PHONE> now",
      "server at <IP> and <IP> up",
      "mixed: <EMAIL>, <PHONE>, <IP>",
      "nothing sensitive in this sentence at all",
      "not-an-email @ example dot com 1.2.3"))
  }

  test("mixtureWeights: weights sum to 1, alpha<1 boosts small sources, " +
    "alpha=1 is proportional (boost 1)") {
    val sq = spark; import sq.implicits._
    // source b has ~9x source a's tokens
    val corpus = (1L to 10L).map(i => (i, "a", "one two three")) ++
      (11L to 100L).map(i => (i, "b", "four five six"))
    val df = corpus.toDF("doc_id", "source", "text")
    val w = CorpusStats.mixtureWeights(df, alpha = 0.3)
      .orderBy("source").collect()
    ManagedCache.releaseAll()
    assert(math.abs(w.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    // temperature flattening: the small source is over-sampled vs
    // proportional (boost > 1), the big one under-sampled (boost < 1)
    assert(w(0).getDouble(4) > 1.0 && w(1).getDouble(4) < 1.0)
    val prop = CorpusStats.mixtureWeights(df, alpha = 1.0)
      .orderBy("source").collect()
    ManagedCache.releaseAll()
    assert(prop.forall(r => math.abs(r.getDouble(4) - 1.0) < 1e-9),
      "alpha=1 must reproduce proportional sampling exactly")
    // and the proportional weight equals the token share
    assert(math.abs(prop(0).getDouble(3) - 0.1) < 1e-9)
  }

  test("bm25TopK scores a hand-built corpus per the Lucene BM25 formula, " +
    "ranks by rounded score with doc_id tie-break, and drops no-hit docs") {
    val sq = spark; import sq.implicits._
    val corpus = Seq(
      (1L, "spark spark join x"), // 2 terms hit, tf spark=2
      (2L, "spark y z"),          // 1 term hit
      (3L, "other words only")    // no hits -> absent
    ).toDF("doc_id", "text")
    val got = CorpusStats.bm25TopK(corpus, Seq("spark", "join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    ManagedCache.releaseAll()
    // independent scalar computation of the same formula
    val nd = 3.0; val avgdl = (4 + 3 + 3) / 3.0
    def idf(df: Int) = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
    def tn(tf: Int, dl: Int) = tf * 2.2 /
      (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r4(x: Double) = BigDecimal.decimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = r4(r4(idf(2) * tn(2, 4)) + r4(idf(1) * tn(1, 4)))
    val s2 = r4(r4(idf(2) * tn(1, 3)))
    assert(got.toSeq == Seq((1L, 2L, s1), (2L, 1L, s2)))
  }

  test("bigramLogLoss matches hand-computed corpus-LM surprisal and " +
    "drops single-token docs") {
    val sq = spark; import sq.implicits._
    val corpus = Seq(
      (1L, "a b c"), (2L, "a b b"), (3L, "solo")
    ).toDF("doc_id", "text")
    val got = CorpusStats.bigramLogLoss(corpus)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    ManagedCache.releaseAll()
    // corpus counts: (a,b)=2 (b,c)=1 (b,b)=1; prefixes a=2, b=2
    // doc1: -[ln(2/2) + ln(1/2)]/2 = ln2/2; doc2 identical
    val e = BigDecimal.decimal(math.log(2.0) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((1L, 2L, e), (2L, 2L, e)))
  }

  test("bpeEncode segments the Sennrich corpus exactly under the trained " +
    "merge table (vocabulary-path encoding)") {
    val sq = spark; import sq.implicits._
    val corpus = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val merges = CorpusStats.bpeMerges(corpus, nMerges = 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // word-level segmentation under (e,s)(es,t)(l,o)(lo,w)
    val segs = CorpusStats.applyMerges(
      Seq("low", "lower", "newest", "widest").toDF("w")
        .withColumn("s", split(col("w"), "")), "s", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(segs("low") == Seq("low"))
    assert(segs("lower") == Seq("low", "e", "r"))
    assert(segs("newest") == Seq("n", "e", "w", "est"))
    assert(segs("widest") == Seq("w", "i", "d", "est"))
    val enc = CorpusStats.bpeEncode(corpus, merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    ManagedCache.releaseAll()
    // doc1: 5*|low| + 2*|low,e,r| = 5 + 6 = 11 subwords over 7 words
    // doc2: 6*|n,e,w,est| + 3*|w,i,d,est| = 24 + 12 = 36 over 9 words
    assert(enc.toSeq == Seq((1L, 7L, 11L, 1.5714), (2L, 9L, 36L, 4.0)))
  }

  test("t28 HLL vocabulary sketch lands within 5% of the exact distinct " +
    "count per source (rsd 1%)") {
    val approx = docs
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy("source")
      .agg(approx_count_distinct(col("w"), rsd = 0.01).as("a"),
        countDistinct(col("w")).as("e"))
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05,
        s"source ${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("t33 per-domain cap: parse_url recovers the constructed host, " +
    "every registered domain keeps at most the cap, selection is " +
    "deterministic, and the rank filter plans as WindowGroupLimit " +
    "before the exchange") {
    val df = q("t33_domain_cap").build(spark, sf)
    val rows = df.collect()
    val byDomain = rows.groupBy(_.getString(1))
    assert(byDomain.keySet ==
      Set("example.com", "example.org", "example.net"))
    assert(byDomain.values.forall(_.length <= 20))
    // ranks within each domain are exactly 1..n (no gaps, no dups)
    byDomain.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length).toSeq)
    }
    // content-keyed: identical across runs
    val again = q("t33_domain_cap").build(spark, sf).collect()
    assert(rows.map(_.toSeq).sortBy(_.toString).toSeq ==
      again.map(_.toSeq).sortBy(_.toString).toSeq)
    // the scale property: partial limit runs map-side, before the shuffle
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(600))
  }

  test("dsirWeights: a train doc sharing the target split's bigrams " +
    "outweighs one that shares none, counts are per-occurrence, and the " +
    "selected flag follows the rounded weight") {
    val sq = spark; import sq.implicits._
    // md5-split placement precomputed: "red apple cake"/"red apple juice"
    // land in 'val' (the target); the others in 'train' (the raw pool)
    val docs = Seq(
      (1L, "red apple pie"),    // shares "red apple" with the target
      (2L, "blue fish dish"),   // shares nothing
      (3L, "red apple cake"),   // val -> target
      (4L, "red apple juice")   // val -> target
    ).toDF("doc_id", "text")
    val got = CorpusStats.dsirWeights(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    ManagedCache.releaseAll()
    // only the train pool is scored
    assert(got.keySet == Set(1L, 2L))
    // both docs have 2 bigram occurrences
    assert(got(1L)._1 == 2L && got(2L)._1 == 2L)
    // target-leaning beats target-free
    assert(got(1L)._2 > got(2L)._2,
      s"expected doc 1 > doc 2, got $got")
    // the flag is exactly the rounded-weight threshold
    got.values.foreach { case (_, w, sel) => assert(sel == (w > 0.0)) }
  }

  test("t35 perplexity buckets: tertiles cover every doc, sizes differ " +
    "by at most one, and the loss ordering head <= middle <= tail holds") {
    val rows = q("t35_ppl_buckets").build(spark, sf)
      .select("doc_id", "logloss", "bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byB = rows.groupBy(_._3).view.mapValues(_.toSeq).toMap
    assert(byB.keySet == Set("head", "middle", "tail"))
    val sizes = byB.values.map(_.size)
    assert(sizes.max - sizes.min <= 1, s"sizes $sizes")
    assert(sizes.sum == rows.length)
    assert(byB("head").map(_._2).max <= byB("middle").map(_._2).min)
    assert(byB("middle").map(_._2).max <= byB("tail").map(_._2).min)
  }

  test("t36 license tagging recovers the injected license per doc_id " +
    "class and splits permissive/copyleft correctly") {
    val rows = q("t36_license_tag").build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, lic, perm) =>
      val want = (id % 4) match {
        case 0 => ("MIT", true)
        case 1 => ("Apache-2.0", true)
        case 2 => ("GPL-3.0", false)
        case _ => ("unknown", false)
      }
      assert((lic, perm) == want, s"doc $id: got ($lic, $perm)")
    }
  }

  test("linear quality classifier matches a driver-side reference scorer " +
    "(hashed buckets, derived weights, exact integer scores)") {
    val sq = spark; import sq.implicits._
    val rows = Seq(
      (1L, "the quick brown fox"),
      (2L, "the the the"),
      (3L, "zebra quantum flux capacitor maximal entropy"),
      (4L, "lorem ipsum dolor sit amet"))
    val docs = rows.toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = rows.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val score = toks.map { t =>
        val h = md5hex(t)
        val bucket = h(0).toInt * 256 + h(1).toInt
        bucket % 9 - 4
      }.sum.toLong
      id -> ((toks.size.toLong, score, score > 0))
    }.toMap
    val got = CorpusStats.linearQualityScore(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("linear quality classifier: per-row fold form equals the " +
    "explode+join form on a real corpus (the streaming-face identity)") {
    val docs = Tables.t(spark, sf, "documents")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(asMap(CorpusStats.linearQualityScoreRow(docs)) ==
      asMap(CorpusStats.linearQualityScore(docs)))
  }

  test("heavy hitters: output equals the direct threshold query and is " +
    "invariant to the partitioning that shapes the MG candidates") {
    val docs = Tables.t(spark, sf, "documents")
    def hh(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.heavyHitters(df, 200L).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val tok = docs.select(explode(TextFunctions.tokens(col("text")))
      .as("term"))
    val total = tok.count()
    val direct = tok.groupBy("term").count()
      .filter(col("count") * 200 >= total).collect()
      .map(r => (r.getString(0), r.getLong(1), total)).toSet
    val one = hh(docs.repartition(1))
    val many = hh(docs.repartition(7))
    assert(one == direct, s"single-partition run: ${one.size} vs " +
      s"direct ${direct.size}")
    assert(many == direct, "answer must not depend on the partitioning")
  }

  test("normalizeText strips invisibles, folds typographic punctuation " +
    "to ASCII, and passes clean text through unchanged") {
    val sq = spark; import sq.implicits._
    val df = Seq(
      (1L, "​he said “hi” — ok﻿"),
      (2L, "plain ascii"),
      (3L, "it’s ‘fine’")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextFunctions.normalizeText(col("text")).as("c")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "he said \"hi\" - ok",
      2L -> "plain ascii",
      3L -> "it's 'fine'"), got.toString)
  }

  test("t08 computes the corpus-scale explode ONCE: tf persists and " +
    "both consumers (weight join, df aggregate) read the cache instead " +
    "of re-exploding the token stream") {
    val df = q("t08_tfidf_topk").build(spark, sf)
    // execute THIS queryExecution (collect — a write would spawn a
    // separate one for the command), then read the final adaptive plan;
    // only the section before "== Initial Plan ==" is what ran
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // both tf consumers must scan the cache...
    val cacheScans = "(?m)InMemoryTableScan|TableCacheQueryStage".r
      .findAllIn(plan).length
    assert(cacheScans >= 2, s"expected both branches on the tf cache:\n" +
      plan.take(1500))
    // ...and the token explode appears at most once (the cache-build
    // subtree that a TableCacheQueryStage prints) — twice would mean a
    // consumer went back to the token stream
    val generates = "(?m)Generate explode".r.findAllIn(plan).length
    assert(generates <= 1, s"expected <=1 token explode, got $generates:\n" +
      plan.take(1500))
    ManagedCache.releaseAll()
  }

  test("t41 chatParsed: construction arms, JSON round trip, and " +
    "validation stats match the hand-computed contract per doc_id class") {
    val sq = spark; import sq.implicits._
    // 12 identical tokens so every turn slice is predictable by hand
    val txt = "a b c d e f g h i j k l"
    val docs = Seq(0L, 1L, 7L, 11L).map(id => (id, txt))
      .toDF("doc_id", "text")
    val got = TextQueries.chatParsed(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(6), r.getString(5))))
      .toMap
    // (n_turns, n_role_repeats, n_empty, assistant_chars, valid, first_user)
    // doc 0: both arms fire (0%7=0 repeats turn 2, 0%11=0 blanks the
    // final turn — which IS turn 2), 2 turns, ends on the repeated user
    assert(got(0L) == ((2L, 1L, 1L, 0L, false, "a b c")), got(0L).toString)
    // doc 1: clean 4-turn conversation; assistants speak "d e f"+"j k l"
    assert(got(1L) == ((4L, 0L, 0L, 10L, true, "a b c")), got(1L).toString)
    // doc 7: turn 2 swapped to user -> two adjacent repeats in u,u,u,a
    assert(got(7L) == ((4L, 2L, 0L, 5L, false, "a b c")), got(7L).toString)
    // doc 11: 6 turns, final turn blanked -> n_empty=1; assistants
    // speak "d e f" + "j k l" + "" = 10 chars
    assert(got(11L) == ((6L, 0L, 1L, 10L, false, "a b c")),
      got(11L).toString)
  }

  test("t41 stats are computed FROM the parsed JSON: corrupting the " +
    "payload between encode and decode would flip the outputs") {
    val sq = spark; import sq.implicits._
    // the same construction parsed back must reproduce the raw struct
    // array: spot-check by rebuilding the doc-1 conversation from
    // first principles and comparing the first_user the parse recovered
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta " +
      "theta iota kappa lambda mu")).toDF("doc_id", "text")
    val r = TextQueries.chatParsed(docs).select("first_user", "valid")
      .head()
    assert(r.getString(0) == "alpha beta gamma")
    assert(r.getBoolean(1))
  }

  test("p13 composes: invalid conversations never reach the dedup, " +
    "shared prompts collapse to the lowest doc_id, stats roll up per " +
    "conversation length") {
    val sq = spark; import sq.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),    // valid, 4 turns, prompt "a b c"
      (4L, "a b c x y z p q r s t u"),    // valid, 4 turns, SAME prompt
      (2L, "m n o p q r s t u v w x"),    // valid, 6 turns, distinct
      (7L, "a b c d e f g h i j k l"))    // role-repeat arm: invalid
      .toDF("doc_id", "text")
    val parsed = TextQueries.chatParsed(docs)
    val valid = parsed.filter(col("valid"))
      .withColumn("pk", md5(col("first_user")))
    val keepW = org.apache.spark.sql.expressions.Window.partitionBy("pk")
    val out = valid
      .withColumn("__keep", min(col("doc_id")).over(keepW))
      .filter(col("doc_id") === col("__keep"))
      .groupBy("n_turns")
      .agg(count(lit(1)).as("n"), sum("assistant_chars").as("ac"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // doc 4 deduped away (same "a b c" prompt as doc 1); doc 7 invalid;
    // doc 2's assistants speak "p q r"+"v w x"+"p q r" = 15 chars
    assert(out == Set((4L, 1L, 10L), (6L, 1L, 15L)), out.toString)
  }

  test("t47 code detection: every snippet-augmented row flags is_code " +
    "with the exact counter deltas (2 keywords, 2 indented lines, 1 " +
    "semicolon, 2 braces, 2 equals); prose rows keep their raw counts") {
    val out = q("t47_code_detect").build(spark, sf).cache()
    try {
      val aug = out.filter(col("doc_id") % 5 === 0)
      assert(aug.count() > 0)
      assert(aug.filter(!col("is_code")).count() == 0,
        "appended snippet must always trip the detector")
      // the snippet's contribution is a fixed delta over the prose
      // baseline: recompute the baseline from the raw text and check
      // one augmented row's counters decompose as baseline + delta
      val base = spark.read
        .parquet(s"$sf/documents.parquet")
        .selectExpr("doc_id",
          "CAST(length(text) - length(replace(text, ';', '')) " +
            "AS BIGINT) AS semi0",
          "CAST((length(lower(text)) - length(replace(lower(text), " +
            "'return', ''))) DIV 6 AS BIGINT) AS ret0")
        .filter(col("doc_id") % 5 === 0)
      val j = aug.join(base, "doc_id")
      assert(j.filter(col("n_semi") =!= col("semi0") + 1).count() == 0,
        "snippet adds exactly one semicolon")
      assert(j.filter(col("n_kw") < col("ret0") + 2).count() == 0,
        "snippet adds at least def+return keyword hits")
    } finally out.unpersist()
  }

  test("t49 C4 line rules: dropped arms never reach cleaned, the " +
    "quote terminator survives, each page flag fires on its residue " +
    "class, and only fully-clean pages pass the 5-sentence floor") {
    val out = q("t49_c4_line_rules").build(spark, sf).cache()
    try {
      // the two always-dropped constructed lines never appear
      assert(out.filter(col("cleaned").contains("Two words.") ||
        col("cleaned").contains("no terminal punctuation"))
        .count() == 0, "punct/word-count-dropped lines leaked through")
      // the '"'-terminated line is kept on EVERY page
      assert(out.filter(!col("cleaned")
        .contains("She said the cleaner works.\"")).count() == 0,
        "quote-terminated line must survive the punct rule")
      // javascript lines are dropped from cleaned even where kept
      assert(out.filter(lower(col("cleaned")).contains("javascript"))
        .count() == 0)
      // page flags fire exactly on their residue classes
      assert(out.filter(col("doc_id") % 5 === 0 && col("r_brace"))
        .count() == 0)
      assert(out.filter(col("doc_id") % 5 =!= 0 && !col("r_brace"))
        .count() == 0)
      assert(out.filter(col("doc_id") % 11 === 0 && col("r_lorem"))
        .count() == 0)
      // a page clean of all three residues keeps: 5 constructed
      // sentence enders clear the floor; any residue page fails
      val clean = out.filter(col("doc_id") % 5 =!= 0 &&
        col("doc_id") % 7 =!= 0 && col("doc_id") % 11 =!= 0)
      assert(clean.count() > 0)
      assert(clean.filter(!col("keep")).count() == 0,
        "residue-free pages must pass all rules")
      assert(out.filter(col("doc_id") % 7 === 0 && col("keep"))
        .count() == 0,
        "javascript pages lose a sentence and miss the floor")
    } finally out.unpersist()
  }

  test("t50 special tokens: each injection arm counts exactly its own " +
    "family (eot twice, inst once, im once), the clean arm reads all " +
    "zeros, and the flag partitions the corpus on the residue") {
    val out = q("t50_special_tokens").build(spark, sf).cache()
    try {
      assert(out.filter(col("doc_id") % 4 === 0 &&
        (col("n_eot") =!= 2 || col("n_inst") =!= 0)).count() == 0)
      assert(out.filter(col("doc_id") % 4 === 1 &&
        (col("n_inst") =!= 1 || col("n_eot") =!= 0)).count() == 0)
      assert(out.filter(col("doc_id") % 4 === 2 && col("n_im") =!= 1)
        .count() == 0)
      assert(out.filter(col("doc_id") % 4 === 3 &&
        (col("has_special") || col("n_eot") + col("n_inst") +
          col("n_im") =!= 0)).count() == 0,
        "the clean arm must read zero everywhere")
      assert(out.filter((col("doc_id") % 4 < 3) !== col("has_special"))
        .count() == 0)
    } finally out.unpersist()
  }
}
