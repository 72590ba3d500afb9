package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition-based quality signals — the Gopher rules (Rae et al.
  * 2021, "Scaling Language Models", Table A1), the repetition half of
  * the heuristic filter stack that Dolma and FineWeb also ship: a
  * document dominated by one repeated n-gram, or whose text is largely
  * covered by n-grams that appear more than once, is boilerplate or
  * spam and gets filtered before training.
  *
  * Signals per document (integer ppm of the document's characters):
  *  - `top{2,3,4}_ppm` — characters covered by occurrences of the
  *    single most frequent word n-gram (ties broken lexicographically
  *    smallest, so both engines pick the same gram).
  *  - `dup5_ppm` — characters covered by word 5-grams occurring more
  *    than once.
  *  - `dup_line_ppm` / `dup_para_ppm` — characters covered by LINES /
  *    PARAGRAPHS whose text occurs more than once in the document
  *    (Rae et al. Table A1's duplicate-line / duplicate-paragraph
  *    character fractions). Lines split on newline, paragraphs on a
  *    blank line; empty segments contribute zero characters either way.
  *
  * Coverage is OCCURRENCE-WEIGHTED (count × gram length, capped at
  * the document length): sliding-window occurrences overlap, and the
  * exact char-interval union Gopher describes is not expressible as a
  * relational aggregate — the occurrence-weighted form is the
  * standard relational surrogate, monotone in the same signal, and
  * deterministic across engines. The verdict column applies Gopher's
  * published thresholds (top2 > 0.20, top3 > 0.18, top4 > 0.16,
  * dup5 > 0.15, dup-line chars > 0.20, dup-para chars > 0.20) to the
  * surrogate.
  *
  * Scale shape: one tokenization per document fanned into all four n
  * in a single exploded frame (one shuffle on (doc, n, gram)), a
  * per-(doc, n) window top-1 over gram counts, then per-doc
  * arithmetic — fully distributed, nothing corpus-global.
  *
  * Reference: services/processing has no repetition filtering; this
  * extends the LLM-pipeline mandate's text-quality family.
  */
object Repetition {

  private val ns = Seq(2, 3, 4, 5)

  /** (doc_id, n_words, top2_ppm, top3_ppm, top4_ppm, dup5_ppm,
    * dup_line_ppm, dup_para_ppm, gopher_pass) for every document. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val base = graft.Tables.spread(docs)
      .select(col("doc_id"),
        expr("regexp_extract_all(text, '\\\\S+', 0)").as("ws"),
        expr("filter(split(text, '\\\\n'), x -> x <> '')").as("lines"),
        expr("filter(split(text, '\\\\n\\\\n'), x -> x <> '')").as("paras"),
        length(col("text")).cast("long").as("c"))
      .localCheckpoint() // one tokenization feeds all n branches
    // every n's sliding grams in ONE exploded frame: (doc, n, gram).
    // The short-doc guard is load-bearing: sequence(1, 0) in Spark is
    // the DESCENDING array [1, 0] (not empty), and slice(ws, 0, n)
    // throws — a doc with fewer than n words must yield NO grams.
    val gramArr: Column = array(ns.map { n =>
      expr(s"""CASE WHEN size(ws) >= $n THEN
              |  transform(sequence(1, size(ws) - ${n - 1}),
              |    i -> struct($n AS n,
              |      concat_ws(' ', slice(ws, i, $n)) AS g))
              |ELSE array() END""".stripMargin)
    }: _*)
    // lines (n=101) and paragraphs (n=102) ride the same exploded
    // frame and the same single shuffle as the word n-grams
    val segArr: Column = expr(
      """concat(transform(lines, x -> struct(101 AS n, x AS g)),
        |       transform(paras, x -> struct(102 AS n, x AS g)))""".stripMargin)
    val counts = base
      .select(col("doc_id"), col("c"),
        explode(concat(flatten(gramArr), segArr)).as("p"))
      .groupBy(col("doc_id"), col("c"), col("p.n").as("n"),
        col("p.g").as("g"))
      .agg(count(lit(1)).as("cnt"))
    // covered chars, occurrence-weighted; top-1 per (doc, n) for the
    // top-gram signals, cnt >= 2 sum for the duplicate-gram signal
    val covered = (col("cnt") * length(col("g"))).cast("long")
    val wTop = Window.partitionBy(col("doc_id"), col("n"))
      .orderBy(col("cnt").desc, col("g"))
    val perN = counts
      .withColumn("top_cov",
        when(row_number().over(wTop) === 1, covered).otherwise(0L))
      .withColumn("dup_cov",
        when(col("cnt") >= 2, covered).otherwise(0L))
      .groupBy(col("doc_id"), col("c"), col("n"))
      .agg(sum(col("top_cov")).as("top_cov"), sum(col("dup_cov")).as("dup_cov"))
      .groupBy(col("doc_id"), col("c"))
      .agg(
        sum(when(col("n") === 2, col("top_cov")).otherwise(0L)).as("t2"),
        sum(when(col("n") === 3, col("top_cov")).otherwise(0L)).as("t3"),
        sum(when(col("n") === 4, col("top_cov")).otherwise(0L)).as("t4"),
        sum(when(col("n") === 5, col("dup_cov")).otherwise(0L)).as("d5"),
        sum(when(col("n") === 101, col("dup_cov")).otherwise(0L)).as("dl"),
        sum(when(col("n") === 102, col("dup_cov")).otherwise(0L)).as("dp"))
    // one row for EVERY doc (a short doc with no 2-grams must still
    // report zeros, not vanish)
    val intDiv = (a: Column, b: Column) => floor(a / b).cast("long")
    def ppmOf(c0: Column): Column =
      least(lit(1000000L), intDiv(coalesce(c0, lit(0L)) * 1000000L,
        greatest(col("c"), lit(1L))))
    base.select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
        col("c"))
      .join(perN.drop("c"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        ppmOf(col("t2")).as("top2_ppm"), ppmOf(col("t3")).as("top3_ppm"),
        ppmOf(col("t4")).as("top4_ppm"), ppmOf(col("d5")).as("dup5_ppm"),
        ppmOf(col("dl")).as("dup_line_ppm"),
        ppmOf(col("dp")).as("dup_para_ppm"))
      .withColumn("gopher_pass",
        (col("top2_ppm") <= 200000L && col("top3_ppm") <= 180000L &&
          col("top4_ppm") <= 160000L && col("dup5_ppm") <= 150000L &&
          col("dup_line_ppm") <= 200000L && col("dup_para_ppm") <= 200000L)
          .cast("int"))
  }

  /** DuckDB twin: list-slice grams per n, the same (cnt DESC, g ASC)
    * top-1, the same occurrence-weighted ppm arithmetic; line (n=101)
    * and paragraph (n=102) segments union into the same counted frame. */
  def repetitionSignalsSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, text, regexp_extract_all(text, '\\S+') AS ws,
       |         CAST(length(text) AS BIGINT) AS c
       |  FROM main.documents),
       |grams AS (
       |  SELECT doc_id, c, t.n,
       |         array_to_string(ws[i:i+t.n-1], ' ') AS g
       |  FROM w, (VALUES (2),(3),(4),(5)) t(n),
       |       LATERAL unnest(generate_series(1, len(ws) - t.n + 1)) u(i)),
       |segs AS (
       |  SELECT doc_id, c, 101 AS n, u.g
       |  FROM w, LATERAL unnest(list_filter(string_split(text, chr(10)),
       |                                     x -> x <> '')) u(g)
       |  UNION ALL
       |  SELECT doc_id, c, 102 AS n, u.g
       |  FROM w, LATERAL unnest(list_filter(
       |           string_split(text, chr(10) || chr(10)),
       |           x -> x <> '')) u(g)),
       |cnts AS (
       |  SELECT doc_id, c, n, g, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT * FROM grams UNION ALL SELECT * FROM segs)
       |  GROUP BY 1, 2, 3, 4),
       |pern AS (
       |  SELECT doc_id, c, n,
       |         CAST(sum(CASE WHEN rk = 1 THEN cnt * length(g) ELSE 0 END)
       |              AS BIGINT) AS top_cov,
       |         CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(g) ELSE 0 END)
       |              AS BIGINT) AS dup_cov
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n
       |                                     ORDER BY cnt DESC, g) AS rk
       |        FROM cnts)
       |  GROUP BY 1, 2, 3),
       |wide AS (
       |  SELECT doc_id, c,
       |         CAST(sum(CASE WHEN n = 2 THEN top_cov ELSE 0 END) AS BIGINT) AS t2,
       |         CAST(sum(CASE WHEN n = 3 THEN top_cov ELSE 0 END) AS BIGINT) AS t3,
       |         CAST(sum(CASE WHEN n = 4 THEN top_cov ELSE 0 END) AS BIGINT) AS t4,
       |         CAST(sum(CASE WHEN n = 5 THEN dup_cov ELSE 0 END) AS BIGINT) AS d5,
       |         CAST(sum(CASE WHEN n = 101 THEN dup_cov ELSE 0 END) AS BIGINT) AS dl,
       |         CAST(sum(CASE WHEN n = 102 THEN dup_cov ELSE 0 END) AS BIGINT) AS dp
       |  FROM pern GROUP BY 1, 2)
       |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
       |       least(1000000, coalesce(t2, 0) * 1000000 // greatest(w.c, 1)) AS top2_ppm,
       |       least(1000000, coalesce(t3, 0) * 1000000 // greatest(w.c, 1)) AS top3_ppm,
       |       least(1000000, coalesce(t4, 0) * 1000000 // greatest(w.c, 1)) AS top4_ppm,
       |       least(1000000, coalesce(d5, 0) * 1000000 // greatest(w.c, 1)) AS dup5_ppm,
       |       least(1000000, coalesce(dl, 0) * 1000000 // greatest(w.c, 1)) AS dup_line_ppm,
       |       least(1000000, coalesce(dp, 0) * 1000000 // greatest(w.c, 1)) AS dup_para_ppm,
       |       CAST(least(1000000, coalesce(t2, 0) * 1000000 // greatest(w.c, 1)) <= 200000
       |        AND least(1000000, coalesce(t3, 0) * 1000000 // greatest(w.c, 1)) <= 180000
       |        AND least(1000000, coalesce(t4, 0) * 1000000 // greatest(w.c, 1)) <= 160000
       |        AND least(1000000, coalesce(d5, 0) * 1000000 // greatest(w.c, 1)) <= 150000
       |        AND least(1000000, coalesce(dl, 0) * 1000000 // greatest(w.c, 1)) <= 200000
       |        AND least(1000000, coalesce(dp, 0) * 1000000 // greatest(w.c, 1)) <= 200000
       |        AS INT) AS gopher_pass
       |FROM w LEFT JOIN wide ON wide.doc_id = w.doc_id""".stripMargin
}
