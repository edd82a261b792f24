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

  /** Lower-cased whitespace tokens. NOTE: empty/whitespace-only text
    * yields `[""]` (split's empty-string artifact), so token counts read
    * 1, not 0. DuckDB's `string_split_regex` does exactly the same — the
    * quirk is cross-engine CONSISTENT, which is what every oracle in this
    * repo relies on; "fixing" it here would have to be mirrored in ~15
    * oracle statements for zero behavioral value on real corpora. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Invisible/format characters a crawl-text cleaner strips outright:
    * zero-width space/non-joiner, BOM, BEL. Literal chars (no class
    * shorthands) so the same pattern means the same thing to Java regex
    * and RE2 — the t31 dialect rule. */
  val strippableChars: String = "\u200B\u200C\uFEFF\u0007"
  /** Typographic characters folded to ASCII (curly quotes, NBSP,
    * em-dash), char-for-char aligned with [[foldedToChars]]. */
  val foldedFromChars: String = "\u201C\u201D\u2018\u2019\u00A0\u2014"
  val foldedToChars: String = "\"\"'' -"

  /** Unicode text normalization for crawl cleaning: strip invisibles,
    * fold typographic punctuation to ASCII. Pure per-row codegen'd
    * string work (regexp_replace + translate), the stage that runs
    * before tokenization so token/shingle keys are stable across
    * sources that differ only in smart-quote/NBSP habits. */
  def normalizeText(text: Column): Column =
    translate(regexp_replace(text, s"[$strippableChars]", ""),
      foldedFromChars, foldedToChars)

  /** Whitespace token count (BIGINT for oracle parity). */
  def tokenCountWs(text: Column): Column =
    size(tokens(text)).cast("long")

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric symbols — a cheap proxy for subword tokenizer cost
    * accounting. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"),
      lit(0))).cast("long")

  /** PERFORMANCE RULE for every function below: Spark's higher-order array
    * functions evaluate interpreted (outside whole-stage codegen) and
    * re-evaluate any expression referenced INSIDE a lambda on every outer
    * iteration — there is no cross-iteration CSE, and CollapseProject
    * re-inlines "materialized" columns straight back into lambda bodies.
    * So expensive arrays may appear only as TOP-LEVEL HOF arguments
    * (evaluated once per row); per-element work walks the array exactly
    * once via `aggregate`/`zip_with`. Violating this cost 40× on the
    * minhash pipeline (79s → ~2s over the sf0.1 corpus). */

  /** Contiguous token n-gram shingles (distinct), the unit for near-dup
    * jaccard. For docs shorter than n the whole token list is one shingle.
    * (String form — reference semantics; the dedup pipeline uses
    * [[shingleHashes]], which never builds the strings.) */
  def shingles(toks: Column, n: Int): Column = {
    val grams = (1 until n).foldLeft(toks) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j + 1), greatest(size(toks) - j, lit(0))),
        (a, b) => concat_ws(" ", a, b))
    }
    array_distinct(slice(grams, lit(1), greatest(size(toks) - (n - 1), lit(1))))
  }

  /** Distinct 64-bit n-gram shingle hashes computed directly from token
    * hashes — shingle (t_i..t_{i+n-1}) hashes as the xxhash64-fold of the
    * tokens' own hashes, so no n-gram string is ever materialized. `toks`
    * is hashed once per zip_with slot (n small), never per shingle. */
  def shingleHashes(toks: Column, n: Int): Column = {
    val th = tokenHashes(toks) // ONE token-hash definition for all pipelines
    val folded = (1 until n).foldLeft(th) { (acc, j) =>
      zip_with(acc, slice(th, lit(j + 1), greatest(size(th) - j, lit(0))),
        (a, b) => xxhash64(a, b))
    }
    array_distinct(slice(folded, lit(1), greatest(size(th) - (n - 1), lit(1))))
  }

  /** k-permutation MinHash signature over pre-hashed shingles: ONE walk of
    * the hash array; the accumulator carries all k running minima, and
    * permutation i of element h is xxhash64(h, i) — pure long math.
    * Signature is array<bigint> of length k; per-row, no shuffle. */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    aggregate(
      shingleHashes,
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(k - 1)), i => xxhash64(h, i)),
        (a, b) => least(a, b)))

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

  /** Per-token 64-bit hashes (top-level-arg discipline, see the rule
    * above). */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => xxhash64(t))

  /** 64-bit SimHash over pre-hashed tokens in ONE walk: the accumulator
    * carries (per-bit set-counts, token count); the finish lambda folds to
    * a BIGINT whose bit b is set iff more than half the tokens have bit b
    * set (majority vote; ties → 0 — identical to the +1/-1 vote-sum
    * formulation). */
  def simhash64(tokenHashes: Column): Column =
    aggregate(
      tokenHashes,
      struct(array_repeat(lit(0L), 64).as("c"), lit(0L).as("n")),
      (acc, h) => struct(
        zip_with(
          acc.getField("c"),
          transform(sequence(lit(0), lit(63)),
            b => call_function("shiftright", h, b).bitwiseAND(lit(1L))),
          (a, b) => a + b).as("c"),
        (acc.getField("n") + lit(1L)).as("n")),
      acc => aggregate(
        zip_with(acc.getField("c"), sequence(lit(0), lit(63)),
          (c, b) => when(c * 2 > acc.getField("n"),
            call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
        lit(0L), (a, x) => a + x))

  /** Rolling polynomial fingerprint over the token stream (order-sensitive,
    * unlike the set-based minhash): acc = (acc*31 + h(tok)) mod 1e9+7.
    * h(tok) = xxhash64 — fast but Spark-only, so t05 is a rows-only
    * driver entry; [[fingerprintMd5]] is the hash-gated twin. */
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, tk) => pmod(acc * 31 + pmod(xxhash64(tk), lit(1000003L)),
        lit(1000000007L)))

  /** The SAME rolling fingerprint with an md5-derived token hash (first
    * 15 hex chars → 60-bit int, always positive so plain % works) —
    * byte-identical in DuckDB (`CAST('0x'||substr(md5(tk),1,15) AS
    * BIGINT)` + list_reduce), which puts the rolling-fold shape under the
    * driver's hash gate as t05b. xxhash64 stays the production hash
    * ([[fingerprint]]): one 8-byte hash vs md5's 16 bytes + hex-parse —
    * the md5 twin exists for oracle parity, not speed. Init 0 ≡ DuckDB
    * list_reduce's first-element seed: (0*31 + h₁) = h₁, and tokens()
    * never yields an empty array (whitespace-only text → [""]). */
  def fingerprintMd5(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, tk) => (acc * 31 +
        conv(substring(md5(tk), 1, 15), 16, 10).cast("long") % 1000003L)
        % 1000000007L)

  // ---- PII detection / redaction ----------------------------------------
  // Patterns restricted to syntax Java regex and RE2 (the DuckDB engine)
  // interpret identically — character classes, bounded repetition, no
  // backreferences/lookaround — so detection counts and replacements are
  // byte-equal cross-engine (t19's gate proves it).

  /** Email address (practical form, not full RFC 5322). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** International phone in +CC-NNN-NNNN shape. */
  val phoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  /** Dotted-quad IPv4 (syntactic: octet range not enforced). */
  val ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact emails → <EMAIL>, phones → <PHONE>, IPv4 → <IP>, in that
    * order (emails first: their domain part would otherwise feed the IP
    * pattern a dotted tail). Pure per-row codegen'd regexp work — the PII
    * scrub every training-data pipeline runs before tokenization. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "you", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "ser", "se", "no", "los"),
    "fr" -> Seq("le", "la", "et", "un", "pour", "dans", "ce", "une", "les", "des"),
    "zh" -> Seq("的", "一", "是", "不", "了", "在", "人", "有", "我", "他"))

  /** Count of tokens that appear in `words` — native codegen'd hash-set
    * probe ([[TextExpressions.stopwordCount]]); the HOF form below is the
    * TextSpec cross-check. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    TextExpressions.stopwordCount(toks, words)

  /** Interpreted HOF formulation of [[stopwordHits]] (cross-check only). */
  private[graft] def stopwordHitsHof(toks: Column, words: Seq[String]): Column =
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
