package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for 64-bit SimHash over a token array — the
  * simhash twin of [[CosineSimilarity]] (SURVEY §7.3 preference order:
  * native `Expression` before HOF composition for hot-path scalar work).
  *
  * The previous formulation ([[TextFunctions.simhash64]] over
  * `transform(toks, xxhash64)`) expresses the same math but runs
  * interpreted: higher-order array functions evaluate outside whole-stage
  * codegen and walk three lambda trees per token (hash transform, 64-slot
  * zip_with vote, final fold) — it was the slowest query in BENCH_r02
  * (d04, 5.96 s at sf0.1). This compiles to one fused primitive loop
  * (hash each token with the same `XXH64.hashUTF8String(_, 42)` Spark's
  * `xxhash64` uses, accumulate 64 bit-counts, majority-vote fold) inside
  * whole-stage codegen.
  *
  * Bit-identical to the HOF form (asserted in DedupSpec): bit b of the
  * result is set iff strictly more than half of the tokens have bit b set
  * (ties → 0); empty array → 0L; null array → null; a null token hashes to
  * the seed (42), matching `xxhash64(NULL)`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (a.isNullAt(i)) 42L
        else XXH64.hashUTF8String(a.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b).toLong * 2 > n) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i) ? 42L :
         |    $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (int) (($h >>> $b) & 1L);
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ((long) $counts[$b] * 2 > $n) ${ev.value} |= 1L << $b;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

/** Native k-permutation MinHash signature over pre-hashed shingles — the
  * minhash twin of [[SimHash64]]. The HOF formulation
  * ([[TextFunctions.minhashSignature]]) walks an interpreted
  * `aggregate` whose per-element step allocates a fresh k-slot permutation
  * array (`transform(sequence(...))`) and a k-slot `zip_with` minimum —
  * 2k short-lived arrays per shingle, outside codegen. This is one fused
  * primitive loop (k running minima in a local long[], pure
  * `XXH64.hashInt(i, XXH64.hashLong(h, 42))` math — the exact composition
  * Spark's `xxhash64(h, i)` evaluates, so the signature is bit-identical;
  * asserted in DedupSpec).
  *
  * Null shingle slots (cannot arise from [[TextFunctions.shingleHashes]],
  * handled for safety) hash like `xxhash64(NULL, i)`: the null argument is
  * skipped, leaving `hashInt(i, 42)`. Empty array → all Long.MaxValue,
  * matching the HOF accumulator seed.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs k > 0, got $k")
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<bigint>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base =
        if (a.isNullAt(i)) 42L else XXH64.hashLong(a.getLong(i), 42L)
      var j = 0
      while (j < k) {
        val p = XXH64.hashInt(j, base)
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val p = ctx.freshName("p")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $base = $a.isNullAt($i) ? 42L :
         |    $xxh.hashLong($a.getLong($i), 42L);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $p = $xxh.hashInt($j, $base);
         |    if ($p < $mins[$j]) $mins[$j] = $p;
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}

/** Native distinct n-gram shingle hashes over a token array — fuses the
  * [[TextFunctions.shingleHashes]] HOF chain (string-hash `transform`,
  * n-1 `zip_with` folds, `array_distinct`) into one pass: hash each token
  * once (`XXH64.hashUTF8String(_, 42)`, null → 42 like `xxhash64(NULL)`),
  * fold each n-window left-to-right with the exact composition Spark's
  * 2-arg `xxhash64(a, b)` evaluates (`hashLong(b, hashLong(a, 42))`,
  * skipping null/overrun slots exactly as `zip_with` padding does), then
  * keep first occurrences in order (array_distinct semantics). For token
  * counts below n the single partial window survives — identical to the
  * HOF slice guard. Bit-identity with the HOF form asserted in DedupSpec.
  */
/** `distinct = true` (the default, SQL `shingle_hashes`) emits each
  * window's fold once, first-occurrence order — the set form the jaccard/
  * minhash pipelines consume. `distinct = false` (SQL `shingle_hashes_all`)
  * keeps EVERY window in position order — the multiset form frequency
  * signals (t14 repetition) consume; an interpreted HOF transform of the
  * same windows was CodegenFallback and 4× slower. */
case class ShingleHashes(
    child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes needs n > 0, got $n")
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String =
    if (distinct) "shingle_hashes" else "shingle_hashes_all"

  /** Shared by eval and the generated code (codegen calls this static-ish
    * helper instead of inlining the dedup set — the loop body is the hot
    * part; distinct-keeping is one hash-set pass over the folded values). */
  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleHashes.compute(a, n, distinct))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"${ev.value} = new $gad($helper.compute($a, $n, $distinct));"
    })

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  /** One fused pass: token hashes → windowed folds → (optionally)
    * first-occurrence distinct. Public because generated code calls it. */
  def compute(a: ArrayData, n: Int, distinct: Boolean): Array[Long] = {
    val len = a.numElements()
    val th = new Array[Long](len)
    var i = 0
    while (i < len) {
      th(i) =
        if (a.isNullAt(i)) 42L
        else XXH64.hashUTF8String(a.getUTF8String(i), 42L)
      i += 1
    }
    // number of (possibly partial) windows the HOF slice keeps
    val m = math.max(len - (n - 1), math.min(len, 1))
    val seen =
      if (distinct) new java.util.HashSet[java.lang.Long](m * 2) else null
    val out = new Array[Long](m)
    var w = 0
    var outLen = 0
    while (w < m) {
      var f = th(w)
      var s = 1
      while (s < n) {
        // zip_with pads the short side with null, and xxhash64(a, null)
        // still folds the seed step: hashLong(a, 42). Only the lone
        // sub-n-token window ever takes the out-of-range branch — full
        // windows (the only survivors when len >= n) never do.
        f =
          if (w + s < len) XXH64.hashLong(th(w + s), XXH64.hashLong(f, 42L))
          else XXH64.hashLong(f, 42L)
        s += 1
      }
      if (seen == null || seen.add(f)) { out(outLen) = f; outLen += 1 }
      w += 1
    }
    if (outLen == m) out else java.util.Arrays.copyOf(out, outLen)
  }
}

/** Native count-of-tokens-in-word-list — the stopword scoring primitive
  * behind quality stats (t03) and language-ID (t04, which evaluates one of
  * these PER LANGUAGE). The HOF form
  * (`size(filter(toks, tk => array_contains(words, tk)))`) walks an
  * interpreted lambda per token per language; this is one hash-set probe
  * per token inside codegen. Duplicates count (filter semantics); null
  * tokens don't (a null lambda result drops the element). Value-identical
  * to the HOF form — integer counts, asserted in TextSpec. */
case class StopwordCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"stopword_count expects array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "stopword_count"

  @transient private lazy val set: java.util.HashSet[
    org.apache.spark.unsafe.types.UTF8String] = StopwordCount.buildSet(words)

  override protected def nullSafeEval(input: Any): Any =
    StopwordCount.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = StopwordCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val setRef = ctx.addReferenceObj("stopwords", set,
        classOf[java.util.HashSet[_]].getName)
      s"${ev.value} = $helper.count($a, $setRef);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): StopwordCount = copy(child = newChild)
}

object StopwordCount {
  import org.apache.spark.unsafe.types.UTF8String

  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Public because generated code calls it. */
  def count(a: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = a.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && set.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/** Native per-term occurrence counts — the BM25/keyword-search primitive
  * (t25/p15): counts[i] = occurrences of words(i) in the token array, one
  * hash-map probe per token inside codegen. Replaces the corpus-scale
  * `explode(tokens) → isin-filter → (doc, term) partial agg` pipeline with
  * pure per-row scan work (guide §2.4 — the counts are per-document, so no
  * shuffle is fundamentally required to compute them). Value-identical to
  * the explode+count form: duplicates count, null tokens don't match.
  * Returns array<long> in `words` order. */
case class TermCounts(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) if words.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        "term_counts needs a non-empty word list")
      case other => TypeCheckResult.TypeCheckFailure(
        s"term_counts expects array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "term_counts"

  @transient private lazy val index: java.util.HashMap[
    org.apache.spark.unsafe.types.UTF8String, Integer] =
    TermCounts.buildIndex(words)

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TermCounts.count(input.asInstanceOf[ArrayData], index, words.size))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = TermCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val idxRef = ctx.addReferenceObj("termIndex", index,
        classOf[java.util.HashMap[_, _]].getName)
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"${ev.value} = new $gad($helper.count($a, $idxRef, ${words.size}));"
    })

  override protected def withNewChildInternal(
      newChild: Expression): TermCounts = copy(child = newChild)
}

object TermCounts {
  import org.apache.spark.unsafe.types.UTF8String

  def buildIndex(words: Seq[String])
      : java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](words.size * 2)
    words.zipWithIndex.foreach { case (w, i) =>
      m.put(UTF8String.fromString(w), Integer.valueOf(i))
    }
    m
  }

  /** Public because generated code calls it. */
  def count(a: ArrayData,
      index: java.util.HashMap[UTF8String, Integer], k: Int): Array[Long] = {
    val out = new Array[Long](k)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val ix = index.get(a.getUTF8String(i))
        if (ix != null) out(ix.intValue()) += 1L
      }
      i += 1
    }
    out
  }
}

/** Native multiset statistics of a 64-bit gram-hash array — the repetition
  * signals' (t14) per-document reduction: (top, n, d) = (highest single
  * value multiplicity, total values, distinct values). The counts are
  * per-document by definition, so computing them inside the scan removes
  * the whole explode → (doc, gram) exchange → per-doc re-aggregate → join
  * pipeline (guide §2.4); state is one open-addressed long map bounded by
  * the document's own gram count — the same bound the old per-task hash
  * aggregate paid, now without shuffling a corpus of gram rows. Identical
  * counts to the explode form for the same hash input (collision behavior
  * included, since the hashes are the same). */
case class GramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gram_stats expects array<bigint>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("top", LongType, false),
      org.apache.spark.sql.types.StructField("n", LongType, false),
      org.apache.spark.sql.types.StructField("d", LongType, false)))

  override def prettyName: String = "gram_stats"

  override protected def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = GramStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $helper.compute($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): GramStats = copy(child = newChild)
}

object GramStats {
  /** Public because generated code calls it. */
  def compute(a: ArrayData)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val n = a.numElements()
    val m = new java.util.HashMap[java.lang.Long, Array[Long]](n * 2)
    var top = 0L
    var i = 0
    while (i < n) {
      val h = java.lang.Long.valueOf(a.getLong(i))
      var c = m.get(h)
      if (c == null) { c = Array(0L); m.put(h, c) }
      c(0) += 1L
      if (c(0) > top) top = c(0)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](top, n.toLong, m.size.toLong))
  }
}

object TextExpressions {
  import org.apache.spark.sql.GraftBridge

  /** Column-API entry point for [[SimHash64]]: 64-bit simhash of a token
    * array (pass `TextFunctions.tokens(text)`). */
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  /** Column-API entry point for [[MinHashSig]]: k-permutation minhash
    * signature of a pre-hashed shingle array
    * (pass `TextFunctions.shingleHashes(tokens, n)` or [[shingleHashes]]). */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingleHashes), k))

  /** Column-API entry point for [[ShingleHashes]]: distinct n-gram shingle
    * hashes of a token array. */
  def shingleHashes(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(tokens), n))

  /** Column-API entry point for the non-distinct [[ShingleHashes]] form:
    * every window's hash in position order (multiset — for frequency
    * signals, not set algebra). */
  def shingleHashesAll(tokens: Column, n: Int): Column =
    GraftBridge.column(
      ShingleHashes(GraftBridge.expression(tokens), n, distinct = false))

  /** Column-API entry point for [[StopwordCount]]. */
  def stopwordCount(tokens: Column, words: Seq[String]): Column =
    GraftBridge.column(StopwordCount(GraftBridge.expression(tokens), words))

  /** Column-API entry point for [[TermCounts]]: per-term occurrence counts
    * (in `words` order) of a token array. */
  def termCounts(tokens: Column, words: Seq[String]): Column =
    GraftBridge.column(TermCounts(GraftBridge.expression(tokens), words))

  /** Column-API entry point for [[GramStats]]: (top, n, d) multiset stats
    * of a gram-hash array (pass [[shingleHashesAll]]). */
  def gramStats(gramHashes: Column): Column =
    GraftBridge.column(GramStats(GraftBridge.expression(gramHashes)))
}
