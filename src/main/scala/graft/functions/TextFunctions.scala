package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (driver north star, BASELINE.json; not present in the reference, which
  * has no function bodies at all — SURVEY §2.9).
  *
  * Everything here is composed from native Catalyst expressions (string
  * functions + higher-order array functions) — no Scala UDFs — so the work
  * stays inside Tungsten, serializes nothing to the JVM heap per row, and
  * distributes trivially: each expression is per-row, no shuffle, no state.
  * That is the property that lets these run over 100 TB of documents: cost
  * is a single scan.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Whitespace token count (BIGINT for oracle parity). */
  def tokenCountWs(text: Column): Column =
    size(tokens(text)).cast("long")

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric symbols — a cheap proxy for subword tokenizer cost
    * accounting. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"),
      lit(0))).cast("long")

  /** Contiguous token n-gram shingles (distinct), the unit for near-dup
    * jaccard. For docs shorter than n the whole token list is one shingle. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))

  /** k-permutation MinHash signature over a (distinct) shingle array.
    * Permutation i is xxhash64 seeded by mixing in the literal i; the
    * signature is array<bigint> of length k. Per-row, no shuffle. */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleSet, s => xxhash64(s, i))))

  /** LSH band keys for a minhash signature: `bands` hashes, each over a
    * contiguous slice of `rows` signature entries. Docs sharing ANY band key
    * are near-dup candidates (standard banding: P[candidate] ≈
    * 1-(1-j^rows)^bands for jaccard j). Returns array<struct<band:int,
    * bh:bigint>> ready to explode + shuffle on (band, bh). */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      j => struct(j.as("band"),
        xxhash64(slice(sig, j * lit(rows) + lit(1), lit(rows))).as("bh")))

  /** 64-bit SimHash over tokens: per-token xxhash64 bit votes (+1/-1)
    * accumulated into 64 counters in one pass, then folded to a BIGINT.
    * Built as a SQL expression because per-bit variable shifts need
    * column-arg shiftleft/shiftright. */
  def simhash64(toksCol: String): Column = expr(
    s"""aggregate(
       |  zip_with(
       |    aggregate($toksCol,
       |      array_repeat(0L, 64),
       |      (acc, tk) -> zip_with(acc,
       |        transform(sequence(0, 63),
       |          b -> bigint(shiftright(xxhash64(tk), b) & 1L) * 2L - 1L),
       |        (x, y) -> x + y)),
       |    sequence(0, 63),
       |    (v, b) -> if(v > 0L, shiftleft(1L, b), 0L)),
       |  0L, (acc, x) -> acc + x)""".stripMargin)

  /** Rolling polynomial fingerprint over the token stream (order-sensitive,
    * unlike the set-based minhash): acc = (acc*31 + h(tok)) mod 1e9+7. */
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, tk) => pmod(acc * 31 + pmod(xxhash64(tk), lit(1000003L)),
        lit(1000000007L)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "you", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "ser", "se", "no", "los"),
    "fr" -> Seq("le", "la", "et", "un", "pour", "dans", "ce", "une", "les", "des"),
    "zh" -> Seq("的", "一", "是", "不", "了", "在", "人", "有", "我", "他"))

  /** Count of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, tk => array_contains(typedLit(words), tk))).cast("long")

  /** Language-ID: argmax over per-language stopword hit counts; ties break
    * to the lexicographically greatest language code via struct ordering
    * (deterministic). Returns the predicted code. */
  def langId(toks: Column): Column =
    array_max(array(
      stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
        struct(stopwordHits(toks, words).as("score"), lit(lang).as("lang"))
      }: _*)).getField("lang")

  /** Heuristic document-quality score in [0,1]: blends token count,
    * alphabetic ratio, type-token (uniqueness) ratio, and mean token
    * length sanity — the classic cheap pre-filters for LLM training data. */
  def qualityScore(text: Column, toks: Column): Column = {
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    val alphaRatio =
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
        greatest(nChars, lit(1.0))
    val uniqRatio =
      size(array_distinct(toks)).cast("double") / greatest(nToks, lit(1.0))
    val meanTokLen = nChars / greatest(nToks, lit(1.0))
    val lenScore = least(nToks / lit(20.0), lit(1.0))
    val tokLenScore =
      when(meanTokLen.between(3.0, 12.0), 1.0).otherwise(0.5)
    round(least(greatest(
      lenScore * 0.3 + alphaRatio * 0.3 + uniqRatio * 0.2 + tokLenScore * 0.2,
      lit(0.0)), lit(1.0)), 4)
  }
}
