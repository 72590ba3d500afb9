package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The NON-repetition half of the Gopher quality filter (Rae et al.
  * 2021, Table A1) — the document-shape heuristics that run beside the
  * repetition rules ([[Repetition]]) in the Gopher/Dolma/FineWeb
  * stacks: word-count bounds, mean-word-length bounds, symbol-to-word
  * ratios (hash, ellipsis), bullet-/ellipsis-line fractions, the
  * alphabetic-word floor, and the stop-word floor.
  *
  * Signals per document, all integer (the cross-engine determinism
  * rule):
  *  - `n_words` — `\S+` token count.
  *  - `wlen_cpm` — mean word length in centi-chars
  *    (Σ len(word) · 100 / n_words, floor).
  *  - `hash_word_ppm` / `ellipsis_word_ppm` — '#' occurrences /
  *    ellipsis occurrences (ASCII '...' OR the typographic U+2026
  *    character, as the Gopher-derived Dolma/FineWeb stacks count
  *    both) per word, ppm (Table A1's symbol-to-word ratios).
  *  - `bullet_line_ppm` — lines starting with a bullet ('-', '*',
  *    '•') per line, ppm.
  *  - `ellipsis_line_ppm` — lines ending in '...' or U+2026 per
  *    line, ppm.
  *  - `alpha_word_ppm` — words containing at least one ASCII letter
  *    per word, ppm.
  *  - `n_stop_hits` — how many of Gopher's 8 stop words {the, be, to,
  *    of, and, that, have, with} occur as (lowercase, exact) tokens.
  *
  * `gopher_quality_pass` applies the published thresholds: 50 ≤
  * n_words ≤ 100 000; 3 ≤ mean word length ≤ 10; symbol ratios
  * ≤ 0.1; bullet lines ≤ 0.9; ellipsis lines ≤ 0.3; alphabetic words
  * ≥ 0.8; stop-word hits ≥ 2. Documented deviation: word matching is
  * exact-token lowercase (no stemming/case folding — the paper
  * lowercases; a mixed-case corpus pays the stricter check), and the
  * empty document fails on the word-count floor, not on a 0/0.
  *
  * Scale shape: pure per-document array arithmetic over the
  * [[Repetition.positionalBase]] frame — higher-order functions on
  * the ws/lines arrays plus two replace-counts on the text column, no
  * shuffle at all (the one groupBy-free operator in the text family);
  * composes into the combined topology's shared positional frame for
  * free.
  *
  * Reference: services/processing has no quality filtering; this
  * extends the LLM-pipeline mandate's text-quality family
  * (Rae et al. 2021 Table A1, left column).
  */
object GopherQuality {

  /** Gopher's published stop-word list. The list is a PARAMETER of the
    * filter (like the quality floor elsewhere in this engine): Table
    * A1's rule is "at least 2 words from a fixed stop list", and a
    * corpus whose register lacks the published function words (the
    * synthetic testdata carries only `the`/`a`) pins a
    * corpus-appropriate list instead — the rule shape, thresholds and
    * arithmetic are what the oracle checks. */
  val DefaultStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Signals + verdict for every document. */
  def gopherQualitySignals(docs: DataFrame,
                           stopWords: Seq[String] = DefaultStopWords)
      : DataFrame =
    qualitySignalsFromBase(Repetition.positionalBase(docs), stopWords)

  /** [[gopherQualitySignals]] over an already-extracted positional
    * frame — the combined topology's shared-scan entry. */
  def qualitySignalsFromBase(base: DataFrame,
                             stopWords: Seq[String] = DefaultStopWords)
      : DataFrame = {
    val nWords = size(col("ws")).cast("long")
    val nLines = size(col("lines")).cast("long")
    val charSum =
      expr("aggregate(ws, 0L, (acc, w) -> acc + length(w))").cast("long")
    val nHash =
      (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
        .cast("long")
    // exact integer division (matches DuckDB's '//' even past 2^53,
    // where a floored double quotient can differ — ADVICE r12)
    val intDiv = (a: Column, b: Column) =>
      call_function("div", a.cast("long"), b.cast("long"))
    // ASCII '...' (3 chars each) plus typographic U+2026 (1 char each)
    val nEllipsis =
      (intDiv(length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", "")), lit(3L)) +
        (length(col("text")) -
          length(regexp_replace(col("text"), "…", ""))).cast("long"))
    val bulletLines =
      size(expr("filter(lines, l -> l rlike '^[-*•]')")).cast("long")
    val ellipsisLines =
      size(expr("filter(lines, l -> l rlike '(\\\\.\\\\.\\\\.|…)$')"))
        .cast("long")
    val alphaWords =
      size(expr("filter(ws, w -> w rlike '[A-Za-z]')")).cast("long")
    val stopHits = stopWords
      .map(w => when(array_contains(col("ws"), w), 1L).otherwise(0L))
      .reduce(_ + _)
    val perWord = (c: Column) =>
      intDiv(c * lit(1000000L), greatest(nWords, lit(1L)))
    val perLine = (c: Column) =>
      intDiv(c * lit(1000000L), greatest(nLines, lit(1L)))
    base.select(col("doc_id"),
        nWords.as("n_words"),
        intDiv(charSum * lit(100L), greatest(nWords, lit(1L)))
          .as("wlen_cpm"),
        perWord(nHash).as("hash_word_ppm"),
        perWord(nEllipsis).as("ellipsis_word_ppm"),
        perLine(bulletLines).as("bullet_line_ppm"),
        perLine(ellipsisLines).as("ellipsis_line_ppm"),
        perWord(alphaWords).as("alpha_word_ppm"),
        stopHits.as("n_stop_hits"))
      .withColumn("gopher_quality_pass",
        (col("n_words") >= 50L && col("n_words") <= 100000L &&
          col("wlen_cpm") >= 300L && col("wlen_cpm") <= 1000L &&
          col("hash_word_ppm") <= 100000L &&
          col("ellipsis_word_ppm") <= 100000L &&
          col("bullet_line_ppm") <= 900000L &&
          col("ellipsis_line_ppm") <= 300000L &&
          col("alpha_word_ppm") >= 800000L &&
          col("n_stop_hits") >= 2L).cast("int"))
  }

  /** DuckDB twin: the same list arithmetic over regexp_extract_all /
    * string_split arrays, the same integer floors. */
  def gopherQualitySql(source: String = "main.documents",
                       stopWords: Seq[String] = DefaultStopWords): String = {
    // single quotes doubled: a stop word like "don't" must interpolate
    // into a valid (and non-injectable) SQL string literal
    val stopSum = stopWords
      .map(w => s"CAST(list_contains(ws, '${w.replace("'", "''")}') AS BIGINT)")
      .mkString(" + ")
    s"""WITH w AS (
       |  SELECT doc_id, text,
       |         regexp_extract_all(text, '\\S+') AS ws,
       |         list_filter(string_split(text, chr(10)), x -> x <> '')
       |           AS lines
       |  FROM $source),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
       |         AS BIGINT) AS char_sum,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
       |      AS n_hash,
       |    CAST((length(text) - length(replace(text, '...', ''))) // 3
       |         + (length(text) - length(replace(text, '…', '')))
       |         AS BIGINT) AS n_ellipsis,
       |    CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]')))
       |         AS BIGINT) AS bullet_lines,
       |    CAST(len(list_filter(lines,
       |             l -> regexp_matches(l, '(\\.\\.\\.|…)$$')))
       |         AS BIGINT) AS ellipsis_lines,
       |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
       |         AS BIGINT) AS alpha_words,
       |    CAST($stopSum AS BIGINT) AS n_stop_hits
       |  FROM w)
       |SELECT doc_id, n_words,
       |  char_sum * 100 // greatest(n_words, 1) AS wlen_cpm,
       |  n_hash * 1000000 // greatest(n_words, 1) AS hash_word_ppm,
       |  n_ellipsis * 1000000 // greatest(n_words, 1) AS ellipsis_word_ppm,
       |  bullet_lines * 1000000 // greatest(n_lines, 1) AS bullet_line_ppm,
       |  ellipsis_lines * 1000000 // greatest(n_lines, 1) AS ellipsis_line_ppm,
       |  alpha_words * 1000000 // greatest(n_words, 1) AS alpha_word_ppm,
       |  n_stop_hits,
       |  CAST(n_words BETWEEN 50 AND 100000
       |    AND char_sum * 100 // greatest(n_words, 1) BETWEEN 300 AND 1000
       |    AND n_hash * 1000000 // greatest(n_words, 1) <= 100000
       |    AND n_ellipsis * 1000000 // greatest(n_words, 1) <= 100000
       |    AND bullet_lines * 1000000 // greatest(n_lines, 1) <= 900000
       |    AND ellipsis_lines * 1000000 // greatest(n_lines, 1) <= 300000
       |    AND alpha_words * 1000000 // greatest(n_words, 1) >= 800000
       |    AND n_stop_hits >= 2 AS INT) AS gopher_quality_pass
       |FROM sig""".stripMargin
  }
}
