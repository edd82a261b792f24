package graft

import org.apache.spark.sql.functions._
import TextFunctions._

/** Text-analysis queries over the `documents` table (doc_id, text, lang,
  * source, n_chars — FIXTURES.md §B). All single-scan, per-row expression
  * work: no shuffle, trivially parallel at 100 TB. */
object TextQueries {
  val queries: Seq[Q] = Seq(

    Q("t01_token_stats",
      (s, d) => {
        val docs = Tables.t(s, d, "documents")
        val toks = tokens(col("text"))
        docs.select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          tokenCountWs(col("text")).as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_uniq"))
      },
      Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             |CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
             |CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_uniq
             |FROM documents""".stripMargin.replace('\n', ' ')),
      bench = true),

    Q("t02_token_count_bpe",
      (s, d) =>
        Tables.t(s, d, "documents").select(
          col("doc_id"),
          tokenCountBpe(col("text")).as("n_bpe")),
      Some("""SELECT doc_id,
             |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
             |FROM documents""".stripMargin.replace('\n', ' '))),

    Q("t03_stopword_quality",
      (s, d) => {
        val toks = tokens(col("text"))
        Tables.t(s, d, "documents").select(
          col("doc_id"),
          tokenCountWs(col("text")).as("n_tokens"),
          stopwordHits(toks, stopwords("en")).as("n_stop"),
          round(stopwordHits(toks, stopwords("en")).cast("double") /
            greatest(tokenCountWs(col("text")), lit(1L)), 4).as("stop_ratio"))
      },
      Some("""SELECT doc_id,
             |CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens,
             |CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |tk -> list_contains(['the','a','of','and','to','in','is','it','you','that'], tk))) AS BIGINT) AS n_stop,
             |round(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
             |tk -> list_contains(['the','a','of','and','to','in','is','it','you','that'], tk))) AS DOUBLE)
             |/ greatest(len(string_split_regex(trim(lower(text)), '\s+')), 1), 4) AS stop_ratio
             |FROM documents""".stripMargin.replace('\n', ' '))),

    // Heuristic language-ID — not SQL-oracle-expressible in a sane way;
    // determinism + accuracy asserted in TextSpec instead.
    Q("t04_lang_id",
      (s, d) => {
        val toks = tokens(col("text"))
        Tables.t(s, d, "documents").select(
          col("doc_id"), col("lang"), langId(toks).as("lang_pred"))
      },
      None),

    Q("t05_fingerprint",
      (s, d) =>
        Tables.t(s, d, "documents").select(
          col("doc_id"), fingerprint(tokens(col("text"))).as("fp")),
      None),

    Q("t06_quality_score",
      (s, d) => {
        val toks = tokens(col("text"))
        Tables.t(s, d, "documents").select(
          col("doc_id"), qualityScore(col("text"), toks).as("quality"))
      },
      None)
  )
}
