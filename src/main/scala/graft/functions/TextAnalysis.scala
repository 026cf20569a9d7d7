package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline [EXT]
  * (SURVEY.md §2.6): token counting, quality scoring, language-ID
  * heuristic, document fingerprinting. All pure Column expressions over
  * the `documents` table — per-row, no shuffle, embarrassingly parallel:
  * the shape that runs at 100 TB limited only by scan bandwidth.
  *
  * Determinism-by-construction: every score is derived from integer
  * counts with at most one final double division, so DuckDB oracles
  * hash-match bit-for-bit. */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(text, "\\s+")).as("n_tokens")

  /** BPE-ish token count: words / numbers / single non-space symbols —
    * the standard pre-tokenizer regex family. */
  private val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Occurrences of a marker substring (overlap-free), via length delta. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern
      .quote(marker), ""))) / lit(marker.length)).cast("int")

  val queries: Map[String, Q] = Map(
    // Token counting: whitespace and BPE-ish regex tokenizations
    "text_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("ws_tokens"),
        bpeTokenCount(col("text")).as("bpe_tokens"),
        length(col("text")).as("n_chars_checked"))),

    // Quality scoring: integer features + one final double division
    "text_quality_score" -> ((s, d) => {
      val t = col("text")
      val nChars = length(t)
      val nTokens = size(split(t, "\\s+"))
      val nStop = occurrences(t, " the ") + occurrences(t, " a ") +
        occurrences(t, " and ")
      val nPunct = size(regexp_extract_all(t, lit("[.,;:!?]"), lit(0)))
      Tables.documents(s, d).select(
        col("doc_id"),
        nChars.as("n_chars_m"),
        nTokens.as("n_tokens"),
        nStop.as("n_stopwords"),
        nPunct.as("n_punct"),
        // chars-per-token: the classic gibberish detector
        (nChars.cast("double") / nTokens).as("chars_per_token"),
        // quality = stopword density (int counts, one division)
        (nStop.cast("double") * lit(100.0) / nTokens).as("stop_density"))
    }),

    // Language-ID heuristic: marker-word hit counts per language,
    // argmax with deterministic tie order. (N-gram profile LangID
    // reduces to exactly this shape — counts of language-discriminative
    // patterns — and stays a pure scan at any scale.)
    "text_langid" -> ((s, d) => {
      val t = col("text")
      val en = occurrences(t, " the ") + occurrences(t, " and ")
      val de = occurrences(t, " der ") + occurrences(t, " und ")
      val es = occurrences(t, " el ") + occurrences(t, " los ")
      Tables.documents(s, d).select(
        col("doc_id"), col("lang").as("labeled_lang"),
        en.as("en_hits"), de.as("de_hits"), es.as("es_hits"),
        when(en >= de && en >= es, lit("en"))
          .when(de >= es, lit("de"))
          .otherwise(lit("es")).as("pred_lang"))
    }),

    // Document fingerprinting: polynomial rolling hash over the token
    // stream, base 31 mod 2^31-1 (Rabin-Karp). Each token contributes
    // ascii(first char)*256 + len — exact integer arithmetic via a left
    // fold, identical in any engine, single scan at any scale.
    "text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        aggregate(
          split(col("text"), "\\s+"),
          lit(0L),
          (acc, w) => (acc * lit(31L)
            + coalesce(ascii(substring(w, 1, 1)), lit(0)).cast("long") * lit(256L)
            + length(w).cast("long")) % lit(2147483647L)).as("fingerprint"))),

    // Character-entropy quality signal: Shannon entropy of the
    // character distribution per document — the gibberish /
    // compression-ratio heuristic (low entropy = repeated filler, high
    // = random noise; natural text sits in a band). Computed as
    // H = ln(n) − (Σ c·ln c)/n over per-char counts, so every ln
    // argument is an exact integer and the engines agree within the
    // gate's tolerance. One char explode → two hash aggregates. The
    // char class is EXPLICIT ([\s\S], every codepoint) because the
    // engines' dot semantics differ at the margin: Java's dot
    // excludes \r/\u0085/\u2028/\u2029, RE2's excludes only \n —
    // a CRLF document would diverge under '.'.
    "text_entropy" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(call_function("regexp_extract_all",
            col("text"), lit("[\\s\\S]"), lit(0))).as("ch"))
        .groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_chars_e"),
          sum(col("c").cast("double") * log(col("c"))).as("clc"))
        .select(col("doc_id"), col("n_chars_e"),
          (log(col("n_chars_e")) - col("clc") / col("n_chars_e"))
            .as("entropy")))
  )

  val oracles: Map[String, String] = Map(
    "text_token_count" ->
      s"""SELECT doc_id,
         CAST(LEN(REGEXP_SPLIT_TO_ARRAY(text, '\\s+')) AS INTEGER) AS ws_tokens,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
           AS INTEGER) AS bpe_tokens,
         CAST(LENGTH(text) AS INTEGER) AS n_chars_checked
         FROM documents""",
    "text_quality_score" ->
      s"""WITH f AS (SELECT doc_id,
           CAST(LENGTH(text) AS INTEGER) AS n_chars_m,
           CAST(LEN(REGEXP_SPLIT_TO_ARRAY(text, '\\s+')) AS INTEGER) AS n_tokens,
           CAST((LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))) / 5
             + (LENGTH(text) - LENGTH(REPLACE(text, ' a ', ''))) / 3
             + (LENGTH(text) - LENGTH(REPLACE(text, ' and ', ''))) / 5
             AS INTEGER) AS n_stopwords,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[.,;:!?]')) AS INTEGER) AS n_punct
           FROM documents)
         SELECT doc_id, n_chars_m, n_tokens, n_stopwords, n_punct,
           CAST(n_chars_m AS DOUBLE) / n_tokens AS chars_per_token,
           CAST(n_stopwords AS DOUBLE) * 100.0 / n_tokens AS stop_density
         FROM f""",
    "text_langid" ->
      """WITH f AS (SELECT doc_id, lang AS labeled_lang,
           CAST((LENGTH(text) - LENGTH(REPLACE(text, ' the ', ''))) / 5
             + (LENGTH(text) - LENGTH(REPLACE(text, ' and ', ''))) / 5
             AS INTEGER) AS en_hits,
           CAST((LENGTH(text) - LENGTH(REPLACE(text, ' der ', ''))) / 5
             + (LENGTH(text) - LENGTH(REPLACE(text, ' und ', ''))) / 5
             AS INTEGER) AS de_hits,
           CAST((LENGTH(text) - LENGTH(REPLACE(text, ' el ', ''))) / 4
             + (LENGTH(text) - LENGTH(REPLACE(text, ' los ', ''))) / 5
             AS INTEGER) AS es_hits
           FROM documents)
         SELECT doc_id, labeled_lang, en_hits, de_hits, es_hits,
           CASE WHEN en_hits >= de_hits AND en_hits >= es_hits THEN 'en'
                WHEN de_hits >= es_hits THEN 'de'
                ELSE 'es' END AS pred_lang
         FROM f""",
    "text_fingerprint" ->
      s"""SELECT doc_id,
         LIST_REDUCE(
           LIST_PREPEND(CAST(0 AS BIGINT),
             LIST_TRANSFORM(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
               w -> CAST(COALESCE(ASCII(SUBSTR(w, 1, 1)), 0) AS BIGINT) * 256
                    + CAST(LENGTH(w) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % 2147483647) AS fingerprint
         FROM documents""",
    "text_entropy" ->
      """WITH ch AS (
           SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS ch
           FROM documents),
         cc AS (SELECT doc_id, ch, COUNT(*) AS c
                FROM ch GROUP BY doc_id, ch),
         agg AS (
           SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars_e,
             SUM(CAST(c AS DOUBLE) * LN(c)) AS clc
           FROM cc GROUP BY doc_id)
         SELECT doc_id, n_chars_e,
           LN(n_chars_e) - clc / n_chars_e AS entropy
         FROM agg"""
  )
}
