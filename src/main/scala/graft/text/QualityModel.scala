package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of the
  * DCLM / FineWeb-Edu recipes (a learned scorer replaces or audits
  * the heuristic gate; fastText-style linear models are the standard
  * tool). Re-expressed engine-exactly as multinomial Naive Bayes
  * log-odds: the heuristic quality gate labels the corpus (its own
  * documents are the training set, as DCLM seeds from heuristic
  * pools), per-token class counts give add-one-smoothed
  * log-likelihood ratios, and a document's score is the
  * count-weighted sum of its tokens' ratios plus the class prior.
  *
  * Exactness across engines: every per-token weight and the prior are
  * INTEGER micro-nats (round(ln·10⁶)), so per-doc scores are exact
  * BIGINT sums — order-independent, no decimal re-rounding of a
  * float sum anywhere. (The first cut rounded 6-dp double weights and
  * re-rounded the summed score to 4 dp; per-doc sums whose sixth
  * decimal ends in 50 then sit exactly on the round-half boundary,
  * where binary representation error — and HALF_UP vs HALF_EVEN —
  * split the engines. Integer units eliminate that failure class;
  * the only residual cross-engine surface is one libm ln per VOCAB
  * WORD landing within ~1e-10 of a micro-unit tie, the same
  * negligible margin every ln-bearing oracle here rides.)
  *
  * Scale shape: ONE tokenize pass collapsed to (doc, token) counts
  * map-side; the class-count table is vocabulary-sized and broadcasts
  * into the scoring join; everything corpus-wide is one groupBy.
  * This is exactly how a fastText-style filter runs distributed: the
  * model is a broadcast token→weight map, scoring is map-side.
  *
  * The interesting read is DISAGREEMENT: `nb_pos != heur_pos` rows
  * are where the learned signal contradicts the hand rule — the docs
  * a curation team reviews first when tightening a gate.
  *
  * Reference: services/processing (the reference has no model-based
  * filtering; this extends the LLM-pipeline mandate's text-quality
  * family).
  */
object QualityModel {

  /** (doc_id, n_tokens, heur_pos, nb_score_micro, nb_pos) for every
    * doc; nb_score_micro is the log-odds in integer micro-nats. */
  def nbQuality(docs: DataFrame, minQualityPm: Long = 600): DataFrame = {
    // label once: the 7 scoring regexes are the dominant per-row cost
    // (the Clusters.dropsBest lesson), and both the count tables and
    // the scoring read the labeled frame
    val base = graft.Tables.spread(docs)
      .select(col("doc_id"), col("text"),
        (TextAnalysis.qualityExpr >= minQualityPm).cast("int").as("pos"))
      .localCheckpoint()
    // collapsed per-(doc, token) counts from the native run-length
    // expression (r15 tf-frame flip) — no groupBy, no combine table
    val dtf = base
      .select(col("doc_id"), col("pos"),
        explode(graft.functions.TextFunctions.token_tfs(
          expr("regexp_extract_all(text, '\\\\S+', 0)"))).as("p"))
      .select(col("doc_id"), col("pos"),
        col("p.token").as("token"), col("p.tf").as("c"))
    val cls = dtf.groupBy(col("token"))
      .agg(sum(when(col("pos") === 1, col("c")).otherwise(0L)).as("pc"),
        sum(when(col("pos") === 0, col("c")).otherwise(0L)).as("nc"))
    val tot = cls.agg(sum(col("pc")).as("pt"), sum(col("nc")).as("nt"),
      count(lit(1)).as("v"))
    val prior = base.agg(round(
      log((sum(col("pos")) + 1).cast("double") /
        (sum(lit(1) - col("pos")) + 1).cast("double")) * 1e6, 0)
      .cast("long").as("prior_u"))
    // add-one smoothing; weight as INTEGER micro-nats before any sum
    val w = round((
      log((col("pc") + 1).cast("double") / (col("pt") + col("v")).cast("double")) -
      log((col("nc") + 1).cast("double") / (col("nt") + col("v")).cast("double"))
      ) * 1e6, 0).cast("long")
    val weights = cls.crossJoin(broadcast(tot))
      .select(col("token"), w.as("w_u"))
    val scored = dtf.join(broadcast(weights), "token")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("w_u")).as("s_u"))
    // one row FOR EVERY doc: a whitespace-only document produces zero
    // token rows and would otherwise silently vanish from the verdict
    // table — it scores the bare prior, like scoreWith's OOV case
    base.select(col("doc_id"), col("pos"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(prior))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("pos").as("heur_pos"),
        (coalesce(col("s_u"), lit(0L)) + col("prior_u")).as("nb_score_micro"),
        (coalesce(col("s_u"), lit(0L)) + col("prior_u") >= 0)
          .cast("int").as("nb_pos"))
  }

  // --------------------------- factored stages (the streaming surface)

  /** Label + tokenize one document frame into the model's SUFFICIENT
    * STATISTICS: per-token class counts (token, pc, nc) and per-class
    * doc counts (p_docs, n_docs). Both are monoids under + — the
    * property [[graft.streaming.QualityRefresh]] accumulates per-batch
    * deltas on, with the guarantee that summed deltas equal the batch
    * statistics exactly (same argument as GraphRank's edge store). */
  def classCounts(docs: DataFrame, minQualityPm: Long = 600)
      : (DataFrame, DataFrame) = {
    val base = graft.Tables.spread(docs)
      .select(col("doc_id"), col("text"),
        (TextAnalysis.qualityExpr >= minQualityPm).cast("int").as("pos"))
      .localCheckpoint()
    val cls = base
      .select(col("pos"),
        explode(graft.functions.TextFunctions.token_tfs(
          expr("regexp_extract_all(text, '\\\\S+', 0)"))).as("p"))
      .groupBy(col("p.token").as("token"))
      .agg(sum(when(col("pos") === 1, col("p.tf")).otherwise(0L)).as("pc"),
        sum(when(col("pos") === 0, col("p.tf")).otherwise(0L)).as("nc"))
    val dstats = base.agg(
      sum(col("pos")).cast("long").as("p_docs"),
      sum(lit(1) - col("pos")).cast("long").as("n_docs"))
    (cls, dstats)
  }

  /** [[classCounts]] from the SHARED `(doc_id, token, tf)` frame plus
    * the precomputed gate signals ([[TextAnalysis.docSignals]]) — the
    * combined topology's no-retokenize path. Equal to the explode form
    * by construction: `tf` IS the per-doc occurrence count the explode
    * would emit row-by-row, so `sum(tf)` over pos/neg docs is the same
    * pc/nc; dstats reads the signals alone, so token-less docs still
    * count toward the doc totals. */
  def classCountsFromTokens(tokens: DataFrame, signals: DataFrame,
                            minQualityPm: Long = 600)
      : (DataFrame, DataFrame) = {
    val pos = signals.select(col("doc_id"),
      (col("quality_pm") >= minQualityPm).cast("int").as("pos"))
    val cls = tokens.join(pos, Seq("doc_id"))
      .groupBy(col("token"))
      .agg(sum(when(col("pos") === 1, col("tf")).otherwise(0L)).as("pc"),
        sum(when(col("pos") === 0, col("tf")).otherwise(0L)).as("nc"))
    val dstats = pos.agg(
      sum(col("pos")).cast("long").as("p_docs"),
      sum(lit(1) - col("pos")).cast("long").as("n_docs"))
    (cls, dstats)
  }

  /** The model from accumulated sufficient statistics: the broadcast
    * (token, w_u) weight table and the prior, both integer micro-nats
    * — [[nbQuality]]'s exact arithmetic, factored so a streamed count
    * store trains the identical model. */
  def modelFromCounts(cls: DataFrame, pDocs: Long, nDocs: Long)
      : (DataFrame, Long) = {
    val tot = cls.agg(sum(col("pc")).as("pt"), sum(col("nc")).as("nt"),
      count(lit(1)).as("v"))
    val w = round((
      log((col("pc") + 1).cast("double") / (col("pt") + col("v")).cast("double")) -
      log((col("nc") + 1).cast("double") / (col("nt") + col("v")).cast("double"))
      ) * 1e6, 0).cast("long")
    val priorU = math.round(math.log((pDocs + 1).toDouble /
      (nDocs + 1).toDouble) * 1e6)
    (cls.crossJoin(broadcast(tot)).select(col("token"), w.as("w_u")), priorU)
  }

  /** Score any document frame with a FROZEN model — the apply side of
    * the filter (what a curation shard runs against last night's
    * model): map-side tokenize, broadcast weight join, exact BIGINT
    * sum. Docs with no in-vocabulary token score the bare prior. */
  def scoreWith(docs: DataFrame, weights: DataFrame,
                priorU: Long): DataFrame = {
    val s = graft.Tables.spread(docs)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.token_tfs(
          expr("regexp_extract_all(text, '\\\\S+', 0)"))).as("p"))
      .select(col("doc_id"), col("p.token").as("token"), col("p.tf").as("tf"))
      .join(broadcast(weights), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(coalesce(col("w_u"), lit(0L)) * col("tf")).as("s_u"))
    docs.select(col("doc_id")).join(s, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("s_u"), lit(0L)) + priorU).as("nb_score_micro"),
        (coalesce(col("s_u"), lit(0L)) + priorU >= 0).cast("int").as("nb_pos"))
  }

  /** [[scoreWith]] from the SHARED `(doc_id, token, tf)` frame — no
    * re-tokenize: `s_u = Σ tf·w_u`, `n_tokens = Σ tf` (exact integer
    * equality with the explode form, which sums `w_u` once per
    * occurrence). Token-less docs ride in via the docs side and score
    * the bare prior. */
  def scoreWithTokens(docs: DataFrame, tokens: DataFrame,
                      weights: DataFrame, priorU: Long): DataFrame = {
    val s = tokens
      .join(broadcast(weights), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * coalesce(col("w_u"), lit(0L))).as("s_u"))
    docs.select(col("doc_id")).join(s, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("s_u"), lit(0L)) + priorU).as("nb_score_micro"),
        (coalesce(col("s_u"), lit(0L)) + priorU >= 0).cast("int")
          .as("nb_pos"))
  }

  /** DuckDB twin of [[nbQuality]] — same CTE chain, same 1e-6 weight
    * grid, same add-one smoothing. */
  def nbQualitySql(minQualityPm: Long = 600): String =
    s"""WITH labeled AS (
       |  SELECT doc_id, text,
       |         CASE WHEN (${TextAnalysis.qualityPmSql}) >= $minQualityPm
       |              THEN 1 ELSE 0 END AS pos
       |  FROM main.documents),
       |dtf AS (
       |  SELECT doc_id, pos, unnest(regexp_extract_all(text, '\\S+')) AS token
       |  FROM labeled),
       |dtfc AS (
       |  SELECT doc_id, pos, token, CAST(count(*) AS BIGINT) AS c
       |  FROM dtf GROUP BY 1, 2, 3),
       |cls AS (
       |  SELECT token,
       |         CAST(sum(CASE WHEN pos = 1 THEN c ELSE 0 END) AS BIGINT) AS pc,
       |         CAST(sum(CASE WHEN pos = 0 THEN c ELSE 0 END) AS BIGINT) AS nc
       |  FROM dtfc GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(pc) AS BIGINT) AS pt, CAST(sum(nc) AS BIGINT) AS nt,
       |         CAST(count(*) AS BIGINT) AS v
       |  FROM cls),
       |prior AS (
       |  SELECT CAST(round(ln(CAST(sum(pos) + 1 AS DOUBLE) /
       |                       CAST(sum(1 - pos) + 1 AS DOUBLE)) * 1e6, 0)
       |              AS BIGINT) AS prior_u
       |  FROM labeled),
       |wts AS (
       |  SELECT token,
       |         CAST(round((ln(CAST(pc + 1 AS DOUBLE) / CAST(pt + v AS DOUBLE)) -
       |                     ln(CAST(nc + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE)))
       |                    * 1e6, 0) AS BIGINT) AS w_u
       |  FROM cls CROSS JOIN tot),
       |scored AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |         CAST(sum(c * w_u) AS BIGINT) AS s_u
       |  FROM dtfc JOIN wts USING (token) GROUP BY 1)
       |SELECT l.doc_id, coalesce(s.n_tokens, 0) AS n_tokens,
       |       l.pos AS heur_pos,
       |       CAST(coalesce(s.s_u, 0) + prior_u AS BIGINT) AS nb_score_micro,
       |       CAST(coalesce(s.s_u, 0) + prior_u >= 0 AS INT) AS nb_pos
       |FROM labeled l LEFT JOIN scored s USING (doc_id) CROSS JOIN prior""".stripMargin
}
