package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics and cleaning for a training-data pipeline:
  * document frequency, TF-IDF-ranked distinctive terms, token-repetition
  * quality, corpus composition, language-ID confusion, and PII scrubbing.
  *
  * Scale shape: tokenization is a map-side explode (no shuffle); df/tf
  * are single partial-aggregated groupBys; per-doc top-k goes through
  * Spark's WindowGroupLimit (partial top-k per partition before the
  * shuffle); scores are integer-scaled (×1e6 then integer division) so
  * results are bit-identical across engines — no FP rounding at
  * half-boundaries, the one thing a hash-compare can't tolerate.
  */
object CorpusStats {

  private def spread(docs: DataFrame): DataFrame = graft.Tables.spread(docs)

  private val toksSql =
    "SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents"

  /** Collapsed per-(doc, token) term counts via the native run-length
    * expression ([[graft.functions.TokenTfs]] — the r15 tf-frame flip,
    * SCALING.md tfnative): (doc_id, token, tf) born collapsed, no
    * groupBy, no map-side-combine hash table (the relational form's
    * measured 13.7 GB spill source at 1M docs), and every downstream
    * shuffle carries distinct-(doc, token) rows instead of token
    * occurrences. */
  private def docTokenTf(docs: DataFrame): DataFrame =
    spread(docs).select(col("doc_id"),
        explode(graft.functions.TextFunctions.token_tfs(
          expr("regexp_extract_all(text, '\\\\S+', 0)"))).as("p"))
      .select(col("doc_id"), col("p.token").as("token"), col("p.tf").as("tf"))

  // -------------------------------------------------- document frequency
  /** Per-token document frequency + total term frequency. One shuffle
    * of collapsed (doc, token, tf) rows: df is a plain count (one row
    * per doc carrying the token) and tf_total the tf sum — the
    * countDistinct expand the occurrence-row form needed is gone. */
  def docFreq(docs: DataFrame): DataFrame =
    docTokenTf(docs).groupBy("token")
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"))

  def docFreqSql: String =
    s"""WITH toks AS ($toksSql)
       |SELECT token, count(DISTINCT doc_id) AS df, count(*) AS tf_total
       |FROM toks GROUP BY 1""".stripMargin

  // ----------------------------------------------------- TF-IDF top-k
  /** Top-k distinctive terms per document: integer score
    * tf·1e6 / df (floor). df joins broadcast when the vocabulary is
    * small; at web scale the token join shuffles both sides on the
    * token — still one shuffle each. Rank ties break on token. */
  def tfidfTop(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docTokenTf(docs)
    // df derived FROM the tf table (one row per (doc, token), so a
    // plain count per token IS the document frequency) — the corpus is
    // tokenized once, already collapsed (native run-length form)
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "token")
      .select(col("doc_id"), col("token"),
        floor((col("tf") * 1000000L) / col("df")).cast("long").as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("doc_id"), col("token"), col("score"), col("rk"))
  }

  def tfidfTopSql(k: Int = 3): String =
    s"""WITH toks AS ($toksSql),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id, tf.token, (tf.tf * 1000000) // df.df AS score
       |  FROM tf JOIN df USING (token)),
       |ranked AS (
       |  SELECT doc_id, token, score,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY score DESC, token) AS rk
       |  FROM scored)
       |SELECT doc_id, token, CAST(score AS BIGINT) AS score, CAST(rk AS INT) AS rk
       |FROM ranked WHERE rk <= $k""".stripMargin

  // ------------------------------------------------ repetition quality
  /** Token-repetition score, integer per-mille: 1000·(1 − distinct/total).
    * Pure scalar expressions (split + array_distinct) — zero shuffles,
    * embarrassingly parallel at any scale. */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = expr("regexp_extract_all(text, '\\\\S+', 0)")
    val n = size(toks).cast("long")
    val nd = size(array_distinct(toks)).cast("long")
    spread(docs).select(col("doc_id"), n.as("n_tokens"), nd.as("n_distinct"),
      (lit(1000L) - floor((nd * 1000L) / greatest(n, lit(1L))).cast("long"))
        .as("rep_pm"))
  }

  def repetitionSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_distinct,
      |  1000 - (CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS BIGINT) * 1000)
      |    // greatest(len(regexp_extract_all(text, '\S+')), 1) AS rep_pm
      |FROM documents""".stripMargin

  // --------------------------------------------------- corpus composition
  /** Mixing-ratio view: docs and token mass per (source, lang) stratum —
    * the numbers a data-mixture recipe is written against. */
  def corpusMix(docs: DataFrame): DataFrame =
    spread(docs).groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long"))
          .as("total_tokens"))

  def corpusMixSql: String =
    """SELECT source, lang, count(*) AS n_docs,
      |       CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------ language-ID confusion
  /** Confusion matrix of the [[TextAnalysis.langId]] heuristic against
    * the corpus's labeled `lang` — the eval loop for a classifier op. */
  def langConfusion(docs: DataFrame): DataFrame =
    spread(docs).select(col("lang"), TextAnalysis.langPred.as("lang_pred"))
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))

  def langConfusionSql: String =
    s"""WITH pred AS (${TextAnalysis.langIdSql})
       |SELECT d.lang, p.lang_pred, count(*) AS n
       |FROM documents d JOIN pred p USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------- PII scrubbing
  val urlPat = "https?://[^ ]+"
  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val numPat = "[0-9]{6,}"

  /** Redact URLs, emails, and long digit runs (the standard pre-training
    * scrub pass). Replacement order is URL → email → number so an email
    * inside a URL is already gone; counts are over the original text.
    * Pure regexp_replace chain — codegen'd, no shuffle. */
  def scrub(docs: DataFrame): DataFrame = {
    val cleaned = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), urlPat, "<URL>"),
        emailPat, "<EMAIL>"),
      numPat, "<NUM>")
    spread(docs).select(col("doc_id"), cleaned.as("text_clean"),
      regexp_count(col("text"), lit(urlPat)).cast("long").as("n_urls"),
      regexp_count(col("text"), lit(emailPat)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(numPat)).cast("long").as("n_nums"))
  }

  def scrubSql: String =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$urlPat', '<URL>', 'g'),
       |    '$emailPat', '<EMAIL>', 'g'),
       |    '$numPat', '<NUM>', 'g') AS text_clean,
       |  CAST(len(regexp_extract_all(text, '$urlPat')) AS BIGINT) AS n_urls,
       |  CAST(len(regexp_extract_all(text, '$emailPat')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$numPat')) AS BIGINT) AS n_nums
       |FROM documents""".stripMargin

  // --------------------------------------- PII anonymization (Dolma set)
  /** The three PII classes the Dolma pipeline anonymizes (Soldaini et
    * al. 2024, "Dolma: an Open Corpus...", §Anonymization): email
    * addresses, IPv4 addresses, US-style phone numbers — each masked
    * with Dolma's `|||…|||` sentinel tokens so downstream tokenizers
    * see one opaque word. Patterns avoid lookaround so Java regex
    * (Spark) and RE2 (DuckDB) match identically. */
  val ipv4Pat: String = {
    val oct = "(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    s"\\b$oct(\\.$oct){3}\\b"
  }
  val phonePat: String =
    "(\\(\\d{3}\\) ?|\\b\\d{3}[-. ])\\d{3}[-. ]\\d{4}\\b"

  /** The Dolma mask as a composable transform — the single definition
    * both the standalone [[piiScrub]] operator and the curation-funnel
    * `anonymize` stage ([[Curate.curateFull]],
    * [[graft.streaming.CurateIngest]], [[graft.streaming.CombinedIngest]])
    * apply, so the funnel's masked text is bit-identical to the
    * operator's. Replacement order is email → IP → phone (a dotted-quad
    * inside an email is already masked when the IP pass runs). */
  def piiMask(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPat, "|||EMAIL_ADDRESS|||"),
        ipv4Pat, "|||IP_ADDRESS|||"),
      phonePat, "|||PHONE_NUMBER|||")

  /** [[piiMask]] as a DuckDB expression over `inner` — the fragment
    * funnel oracles compose into their CTE chains. */
  def piiMaskSqlExpr(inner: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($inner,
       |    '$emailPat', '|||EMAIL_ADDRESS|||', 'g'),
       |    '$ipv4Pat', '|||IP_ADDRESS|||', 'g'),
       |    '$phonePat', '|||PHONE_NUMBER|||', 'g')""".stripMargin

  /** Redact the Dolma PII classes ([[piiMask]]); counts are over the
    * ORIGINAL text, per class independently. Pure regexp_replace
    * chain — codegen'd, no shuffle, composes with [[scrub]]'s URL pass
    * upstream when both are wanted. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val masked = piiMask(col("text"))
    spread(docs).select(col("doc_id"), masked.as("text_anon"),
      regexp_count(col("text"), lit(emailPat)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(ipv4Pat)).cast("long").as("n_ips"),
      regexp_count(col("text"), lit(phonePat)).cast("long").as("n_phones"))
  }

  /** [[piiScrub]] over the corpus with one deterministic PII instance
    * PLANTED per doc-id residue class — the synthetic corpus carries
    * no natural PII, so the oracle pin over the raw table would only
    * exercise the no-op path; the planted variant makes the
    * cross-engine hash check cover all three patterns and the mask
    * text itself. The twin plants byte-identical strings. */
  def piiScrubPlanted(docs: DataFrame): DataFrame =
    piiScrub(plantPii(docs))

  /** Append one deterministic PII instance per doc-id residue class —
    * the cross-engine planting both the q_pii_scrub pin and the
    * funnel-anonymization pin (q_curate_full_anon) run on, since the
    * synthetic corpus carries no natural PII. [[plantPiiSqlCte]] plants
    * byte-identical strings. */
  def plantPii(docs: DataFrame): DataFrame =
    spread(docs).withColumn("text",
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@ex-mail.com now")))
          .when(col("doc_id") % 5 === 1,
            concat(lit(" from 10.0."), (col("doc_id") % 200).cast("string"),
              lit(".17")))
          .when(col("doc_id") % 5 === 2,
            lit(" call (555) 123-4567 or 555.123.4567"))
          .otherwise(lit(""))))

  /** The [[plantPii]] twin as a one-CTE body over `source`:
    * (doc_id, text) with the planted suffix appended. */
  def plantPiiSqlBody(source: String = "main.documents"): String = {
    val plant =
      """CASE WHEN doc_id % 5 = 0 THEN
        |       ' contact user' || CAST(doc_id AS VARCHAR) ||
        |       '@ex-mail.com now'
        |     WHEN doc_id % 5 = 1 THEN
        |       ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.17'
        |     WHEN doc_id % 5 = 2 THEN ' call (555) 123-4567 or 555.123.4567'
        |     ELSE '' END""".stripMargin
    s"SELECT doc_id, text || $plant AS text FROM $source"
  }

  def piiScrubPlantedSql: String =
    s"""WITH planted AS (
       |  ${plantPiiSqlBody(source = "documents")})
       |${piiScrubSql.replace("FROM documents", "FROM planted")}""".stripMargin

  def piiScrubSql: String =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$emailPat', '|||EMAIL_ADDRESS|||', 'g'),
       |    '$ipv4Pat', '|||IP_ADDRESS|||', 'g'),
       |    '$phonePat', '|||PHONE_NUMBER|||', 'g') AS text_anon,
       |  CAST(len(regexp_extract_all(text, '$emailPat')) AS BIGINT)
       |    AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$ipv4Pat')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(text, '$phonePat')) AS BIGINT)
       |    AS n_phones
       |FROM documents""".stripMargin

  // ------------------------------------------- unigram LM quality score
  /** Per-doc average unigram surprisal (bits/token) against the
    * corpus's own unigram distribution — the cheap KenLM-perplexity
    * proxy used to rank documents by "typicality" before training. Low
    * bits = repetitive/common; high = rare-token-heavy. Two shuffles
    * (vocab count, per-doc average); the frequency table joins
    * broadcast for any real vocabulary (≤ millions of tokens) while
    * the corpus side stays map-side. log2 of identical doubles is
    * IEEE-identical across engines, and avg lands off the 4dp rounding
    * grid (irrational), so round(,4) hash-matches. */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    // per-(doc, token) counts first: the corpus explodes ONCE, the
    // corpus tf derives from the collapsed table (sum of per-doc
    // counts), and the scoring join touches (doc, token) rows instead
    // of every token occurrence. avg over occurrences becomes the
    // c-weighted mean — same quantity, identical in both engines'
    // formulations below.
    //
    // This stays a double sum (log2 terms are irrational — no lossless
    // fixed-point, unlike operators.FixedPoint's money/metric sums).
    // Safe at 4 dp because groups are per-DOC: ≤ a few hundred terms
    // of O(10) bits accumulate ~1e-12 of order-dependent error, five
    // orders below the 1e-4 rounding grid — unlike the per-window
    // averages over thousands of values that motivated FixedPoint.
    val dtf = docTokenTf(docs).select(col("doc_id"), col("token"),
      col("tf").as("c"))
    val tf = dtf.groupBy("token").agg(sum(col("c")).as("cnt"))
    val total = tf.agg(sum(col("cnt")).cast("double").as("total"))
    dtf.join(broadcast(tf), "token")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        round(
          sum(col("c").cast("double") *
            -log2(col("cnt").cast("double") / col("total"))) /
          sum(col("c").cast("double")), 4).as("avg_bits"))
  }

  def unigramSurprisalSql: String =
    s"""WITH toks AS ($toksSql),
       |dtf AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY 1, 2),
       |tf AS (SELECT token, CAST(sum(c) AS BIGINT) AS cnt FROM dtf GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM tf)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |       round(sum(c * -log2(CAST(cnt AS DOUBLE) / total)) /
       |             sum(CAST(c AS DOUBLE)), 4) AS avg_bits
       |FROM dtf JOIN tf USING (token) CROSS JOIN tot
       |GROUP BY 1""".stripMargin

  // ----------------------------------------------- bigram LM perplexity
  /** CCNet-style n-gram LM perplexity filter, at n=2: per document, the
    * mean conditional surprisal −log2 P(w_i | w_{i−1}) under the
    * corpus's own bigram MLE (P = count(w1,w2) / count_left(w1), where
    * count_left is w1's occurrences as a bigram LEFT context — exact
    * normalization: Σ_w2 P(w2|w1) = 1, and every document bigram has
    * corpus count ≥ its own occurrences, so no zeros and no smoothing
    * term to reconcile across engines. Perplexity-style filters rank
    * documents by LM fit (CCNet buckets on KenLM perplexity); bigram
    * MLE is the engine-exact stand-in for the external LM.
    *
    * Scale shape mirrors [[unigramSurprisal]]: the corpus collapses to
    * per-(doc, bigram) counts map-side (one explode via the same
    * lambda-bound adjacent-pair zip as [[Bpe]]), the corpus bigram /
    * left-context tables derive FROM that collapsed table, and the
    * scoring join touches collapsed rows. Per-doc sums are small →
    * the double log-sum is safely below the 4 dp grid (same argument
    * as unigram). */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    // collapsed per-(doc, bigram) counts straight from the native
    // run-length expression at n = 2 (r15 tf-frame flip): the gram is
    // "w1 w2" with exactly one space (tokens are \S+), so the two
    // words split back exactly; docs under 2 words emit zero grams and
    // vanish, matching the old size(w) >= 2 filter
    val dbf = spread(docs)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.token_tfs(
          expr("regexp_extract_all(text, '\\\\S+', 0)"), 2)).as("p"))
      .select(col("doc_id"),
        substring_index(col("p.token"), " ", 1).as("w1"),
        substring_index(col("p.token"), " ", -1).as("w2"),
        col("p.tf").as("c"))
    val bf = dbf.groupBy("w1", "w2").agg(sum(col("c")).as("bc"))
    val lf = bf.groupBy("w1").agg(sum(col("bc")).as("lc"))
    // NO broadcast hints: unlike the unigram vocabulary, the bigram
    // table grows toward corpus size (~#distinct bigrams) — forcing it
    // broadcast is exactly the 100 TB trap. AQE picks broadcast when
    // the aggregated tables turn out small, shuffle join when not.
    dbf.join(bf, Seq("w1", "w2"))
      .join(lf, Seq("w1"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
        round(
          sum(col("c").cast("double") *
            -log2(col("bc").cast("double") / col("lc").cast("double"))) /
          sum(col("c").cast("double")), 4).as("avg_bits"))
  }

  def bigramSurprisalSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents
       |  WHERE len(regexp_extract_all(text, '\\S+')) >= 2),
       |pos AS (
       |  SELECT doc_id, unnest(w) AS tok,
       |         unnest(range(1, len(w) + 1)) AS p
       |  FROM t),
       |pairs AS (
       |  SELECT doc_id, tok AS w1,
       |         lead(tok) OVER (PARTITION BY doc_id ORDER BY p) AS w2
       |  FROM pos),
       |dbf AS (
       |  SELECT doc_id, w1, w2, count(*) AS c
       |  FROM pairs WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
       |bf AS (SELECT w1, w2, CAST(sum(c) AS BIGINT) AS bc FROM dbf GROUP BY 1, 2),
       |lf AS (SELECT w1, CAST(sum(bc) AS BIGINT) AS lc FROM bf GROUP BY 1)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |       round(sum(c * -log2(CAST(bc AS DOUBLE) / CAST(lc AS DOUBLE))) /
       |             sum(CAST(c AS DOUBLE)), 4) AS avg_bits
       |FROM dbf JOIN bf USING (w1, w2) JOIN lf USING (w1)
       |GROUP BY 1""".stripMargin

  // ------------------------------------------- importance weighting (DSIR)
  /** DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus
    * document by how much its hashed-unigram feature distribution looks
    * like a TARGET domain (here: doc_id < targetMaxId stands in for the
    * curated target set, same convention as the query sets elsewhere).
    * Tokens hash into `buckets` feature buckets (md5 universal hash —
    * replicable in any engine); each bucket gets a target/corpus
    * probability ratio; a document's importance score is the sum of its
    * tokens' bucket ratios. DSIR proper sums log-ratios — engines'
    * libm log isn't bit-portable, so this uses the ratio itself in
    * fixed point (same ranking intent, hash-checkable): probabilities
    * quantize to parts-per-million (add-one smoothing), ratios to 1e4.
    * All arithmetic stays in Long lanes (ppm ≤ 1e6, counts ≤ 1e12
    * before overflow risk — documented headroom, not luck).
    *
    * Scale shape: tokenize + bucket are map-side; the two distribution
    * aggregates shuffle ≤ `buckets` rows; the ratio table (buckets
    * rows) broadcasts onto the token stream; the per-doc sum
    * partial-aggregates map-side because a doc's tokens stay in its
    * partition after the explode. The corpus is scanned, never
    * pair-joined. */
  def importanceWeights(docs: DataFrame, targetMaxId: Long = 50,
                        buckets: Int = 64): DataFrame = {
    // collapsed (doc, token, tf) rows (r15 native tf frame): every
    // count below becomes a tf-weighted sum — identical arithmetic,
    // and the bucket hash + distribution scans touch distinct
    // (doc, token) rows instead of token occurrences
    val toks = docTokenTf(docs).withColumn("bucket",
      pmod(expr("conv(substring(md5(token), 1, 15), 16, 10)").cast("long"),
        lit(buckets.toLong)))
    def dist(t: DataFrame, pcol: String): DataFrame = t
      .groupBy("bucket").agg(sum(col("tf")).as("cnt"))
      .withColumn("__k", lit(1))
      .join(broadcast(t.agg((sum(col("tf")) + buckets).as("total"))
        .withColumn("__k", lit(1))), "__k")
      // add-one smoothing, parts-per-million quantization. `div` (not
      // `/`): Spark's / on longs is DOUBLE division — inexact past
      // 2^53, where DuckDB's // stays integer-exact
      .select(col("bucket"),
        expr("((cnt + 1) * 1000000) div total").as(pcol))
    val p = dist(toks.filter(col("doc_id") < targetMaxId), "p_ppm")
    val q = dist(toks, "q_ppm")
    val ratio = p.join(q, "bucket")
      .select(col("bucket"),
        expr("(p_ppm * 10000) div greatest(q_ppm, 1)").as("ratio_fp"))
    // ratio_fp ≤ 1e10, tf ≤ doc length: the per-term product stays
    // ≤ ~1e14 and the per-doc sum far below Long overflow (the same
    // documented headroom as the ppm lanes above)
    toks.join(broadcast(ratio), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("ratio_fp") * col("tf")).as("imp_score"))
  }

  def importanceWeightsSql(targetMaxId: Long = 50, buckets: Int = 64): String =
    s"""WITH toks AS (
       |  SELECT doc_id, token,
       |         ('0x' || substr(md5(token), 1, 15))::BIGINT % $buckets AS bucket
       |  FROM ($toksSql)),
       |p AS (
       |  SELECT bucket,
       |         CAST((cnt + 1) * 1000000 // total AS BIGINT) AS p_ppm
       |  FROM (SELECT bucket, count(*) AS cnt FROM toks
       |        WHERE doc_id < $targetMaxId GROUP BY 1)
       |  CROSS JOIN (SELECT count(*) + $buckets AS total FROM toks
       |              WHERE doc_id < $targetMaxId)),
       |q AS (
       |  SELECT bucket,
       |         CAST((cnt + 1) * 1000000 // total AS BIGINT) AS q_ppm
       |  FROM (SELECT bucket, count(*) AS cnt FROM toks GROUP BY 1)
       |  CROSS JOIN (SELECT count(*) + $buckets AS total FROM toks)),
       |ratio AS (
       |  SELECT bucket,
       |         CAST(p_ppm * 10000 // greatest(q_ppm, 1) AS BIGINT) AS ratio_fp
       |  FROM p JOIN q USING (bucket))
       |SELECT doc_id, count(*) AS n_tokens,
       |       CAST(sum(ratio_fp) AS BIGINT) AS imp_score
       |FROM toks JOIN ratio USING (bucket)
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------ BM25 ranking
  /** Okapi BM25 document ranking against a query term set — the
    * standard lexical retrieval scorer (Robertson & Zaragoza 2009):
    * score(d, Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene form —
    * non-negative for any df). The retrieval companion to the ANN
    * family: hybrid corpus search is ANN candidates ∪ BM25 candidates.
    *
    * Scale shape: ONE map-side tokenization with the doc length
    * lambda-bound onto the exploded rows (no second scan for dl); the
    * token filter to the query set happens BEFORE the (doc, term)
    * aggregate, so the only corpus-wide shuffle carries query-term
    * rows only; N / avgdl / df collapse to a ≤|Q|-row idf table that
    * broadcasts into the scoring join. Doubles appear only in the
    * final log/ratio, rounded to the 4 dp grid (same cross-engine
    * contract as the surprisal family). */
  def bm25(docs: DataFrame, queryTerms: Seq[String] = Seq("spark", "join", "window", "hash"),
           k1: Double = 1.2, b: Double = 0.75, k: Int = 50): DataFrame =
    bm25Units(docs, "text", Seq("doc_id"), queryTerms, k1, b, k)

  /** [[bm25]] over arbitrary retrieval units: `idCols` identifies a
    * unit (a document, a (doc, chunk) pair, …), `textCol` its text —
    * chunk-level retrieval IS the RAG read path (index the chunks the
    * trainer consumes, not whole documents). Same plan shape. */
  def bm25Units(units: DataFrame, textCol: String, idCols: Seq[String],
                queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                k: Int = 50): DataFrame = {
    val ids = idCols.map(col)
    val w = expr(s"regexp_extract_all($textCol, '\\\\S+', 0)")
    // bind the token array once: dl rides every exploded row
    val toks = spread(units)
      .select(ids :+ explode(
        transform(array(w), arr =>
          transform(arr, t => struct(t.as("token"), size(arr).as("dl"))))
          .getItem(0)).as("p"): _*)
      .select(ids :+ col("p.token").as("token") :+ col("p.dl").as("dl"): _*)
    val stats = units.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(size(w)) / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("token").isin(queryTerms: _*))
      .groupBy((ids :+ col("token")): _*)
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val df = tf.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    // ≤|Q| rows × 1 stats row: the sanctioned tiny-side cross join
    val idf = df.crossJoin(broadcast(stats))
      .select(col("token"),
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0).as("idf"),
        col("avgdl"))
    val wRank = Window.orderBy(col("score").desc +: ids: _*)
    tf.join(broadcast(idf), "token")
      .select(ids :+
        (col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"): _*)
      .groupBy(ids: _*)
      .agg(round(sum(col("s")), 4).as("score"))
      .orderBy(col("score").desc +: ids: _*)
      .limit(k)
      .withColumn("rk", row_number().over(wRank).cast("int"))
  }

  def bm25Sql(queryTerms: Seq[String] = Seq("spark", "join", "window", "hash"),
              k1: Double = 1.2, b: Double = 0.75, k: Int = 50): String =
    bm25UnitsSql("SELECT doc_id, text FROM documents", "text", Seq("doc_id"),
      queryTerms, k1, b, k)

  def bm25UnitsSql(sourceSql: String, textCol: String, idCols: Seq[String],
                   queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
                   k: Int = 50): String = {
    // escape quotes: the Spark side (`isin`) takes terms as values, so
    // the SQL twin must survive the same inputs (o'brien)
    val terms = queryTerms.map(t => "'" + t.replace("'", "''") + "'").mkString(", ")
    val ids = idCols.mkString(", ")
    val idsTf = idCols.map("tf." + _).mkString(", ")
    s"""WITH units AS (
       |$sourceSql
       |),
       |toks AS (
       |  SELECT $ids, unnest(regexp_extract_all($textCol, '\\S+')) AS token,
       |         len(regexp_extract_all($textCol, '\\S+')) AS dl
       |  FROM units),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |         CAST(sum(len(regexp_extract_all($textCol, '\\S+'))) AS DOUBLE)
       |           / count(*) AS avgdl
       |  FROM units),
       |tf AS (
       |  SELECT $ids, token, count(*) AS tf, max(dl) AS dl
       |  FROM toks WHERE token IN ($terms) GROUP BY $ids, token),
       |idf AS (
       |  SELECT token,
       |         ln((n_docs - CAST(count(*) AS DOUBLE) + 0.5)
       |            / (CAST(count(*) AS DOUBLE) + 0.5) + 1.0) AS idf,
       |         max(avgdl) AS avgdl
       |  FROM tf CROSS JOIN stats GROUP BY token, n_docs),
       |scored AS (
       |  SELECT $idsTf,
       |         round(sum(idf.idf * (tf.tf * ${k1 + 1})
       |               / (tf.tf + $k1 * (${1.0 - b} + $b * tf.dl / idf.avgdl))), 4)
       |           AS score
       |  FROM tf JOIN idf USING (token) GROUP BY $idsTf)
       |SELECT $ids, score,
       |       CAST(row_number() OVER (ORDER BY score DESC, $ids) AS INT) AS rk
       |FROM scored ORDER BY score DESC, $ids LIMIT $k""".stripMargin
  }
}
