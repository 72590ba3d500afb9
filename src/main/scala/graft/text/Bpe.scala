package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding statistics and trainer over the documents table
  * (Sennrich et al. 2016 — the vocabulary-construction step every
  * LLM-data pipeline runs before token counting means anything).
  *
  * Decomposition is the classic one: the corpus collapses to a
  * word-frequency table first (groupBy word — at 100 TB this is the
  * only pass over raw text; web-scale corpora have ~10⁸ distinct words
  * vs ~10¹¹ running words, a 1000× reduction), and every subsequent
  * pair count runs over DISTINCT WORDS weighted by frequency, never
  * over the corpus again. Words split into character symbols with a
  * trailing end-of-word marker; each merge round is one small
  * map-side explode + groupBy over the word table and a single-row
  * argmax collect.
  *
  * Driver-side state per round is exactly one (pair, count) row —
  * bounded and documented; the merge rewrite itself is a Catalyst
  * higher-order fold (greedy left-to-right, the reference semantics),
  * executed distributed. At scale you batch the top-B *disjoint* pairs
  * per round to amortize job overhead (see SCALING.md); the per-round
  * logic is identical.
  */
object Bpe {

  private val EOW = "</w>"

  /** word → n_words frequency table (the only full-corpus pass).
    * Per-doc counts come collapsed from the native run-length
    * expression (r15 tf-frame flip), so the one exchange carries
    * distinct-(doc, word) rows and the map side holds no vocab-sized
    * combine hash table. */
  def wordFreq(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(explode(graft.functions.TextFunctions.token_tfs(
        expr("regexp_extract_all(text, '\\\\S+', 0)"))).as("p"))
      .groupBy(col("p.token").as("word"))
      .agg(sum(col("p.tf")).as("freq"))

  /** Character symbols + end-of-word marker for one word. */
  private def charSyms(word: Column): Column =
    concat(filter(split(word, ""), s => s =!= ""), array(lit(EOW)))

  /** Frequency-weighted adjacent-symbol pair counts over distinct
    * words — the quantity BPE maximizes each round. Pairs are built
    * map-side with zip_with over two slices (no window function, no
    * per-symbol shuffle); the only exchange is the groupBy(pair). */
  def pairCounts(docs: DataFrame): DataFrame = {
    val words = wordFreq(docs).withColumn("syms", charSyms(col("word")))
    pairCountsOfSyms(words)
  }

  private def pairCountsOfSyms(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("freq")).as("n"))

  /** Top-k pairs, deterministically ordered (count desc, then pair) —
    * the oracle-checked surface. TakeOrderedAndProject keeps the
    * global top-k scale-safe (partial top-k per partition). */
  def topPairs(docs: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("n").desc, col("left_sym"), col("right_sym"))
    pairCounts(docs)
      .orderBy(col("n").desc, col("left_sym"), col("right_sym"))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("int"))
  }

  def topPairsSql(k: Int = 20): String =
    s"""WITH wf AS (
       |  SELECT word, count(*) AS freq
       |  FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS word
       |        FROM documents) GROUP BY 1),
       |syms AS (
       |  SELECT row_number() OVER () AS wid, freq,
       |         list_append(string_split(word, ''), '$EOW') AS s
       |  FROM wf),
       |pos AS (
       |  SELECT wid, freq, unnest(s) AS sym,
       |         unnest(range(1, len(s) + 1)) AS p
       |  FROM syms),
       |pairs AS (
       |  SELECT freq, sym AS left_sym,
       |         lead(sym) OVER (PARTITION BY wid ORDER BY p) AS right_sym
       |  FROM pos),
       |cnt AS (
       |  SELECT left_sym, right_sym, CAST(sum(freq) AS BIGINT) AS n
       |  FROM pairs WHERE right_sym IS NOT NULL GROUP BY 1, 2)
       |SELECT left_sym, right_sym, n,
       |       CAST(row_number() OVER (ORDER BY n DESC, left_sym, right_sym) AS INT) AS rank
       |FROM cnt
       |ORDER BY n DESC, left_sym, right_sym
       |LIMIT $k""".stripMargin

  /** One BPE merge applied to a symbol array: greedy left-to-right
    * fold — [a,a,a] under merge (a,a) → [aa,a], the reference
    * semantics. Runs as a Catalyst higher-order aggregate, fully
    * distributed, no UDF. */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
             element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Learned merge, in order. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, n: Long)

  /** Train nMerges BPE merges. Each round: distributed pair count over
    * the word table, ONE bounded collect (≤ batchB rows), distributed
    * fold rewrites. localCheckpoint every few merges truncates the
    * otherwise linearly-growing lineage of nested higher-order folds.
    * Returns the merge list and the final word → symbols table.
    *
    * `batchB` > 1 is the scale path: a 30k-merge vocab at one merge
    * per Spark job is 30k jobs; batching applies up to B merges per
    * pair-count pass. The batch is the PREFIX of the global candidate
    * order (count desc, pair asc) up to the first symbol conflict —
    * stopping at the first conflict (not skipping past it) means every
    * applied pair's count is still exact when it's applied (merging
    * disjoint symbols can't change it), and any pair a batch merge
    * creates or destroys involves a symbol of a pair that ranked BELOW
    * the whole batch, so new pairs can't outrank what the batch
    * applied. Sequential (batchB=1) and batched training therefore
    * agree whenever the leaderboard's top pairs are symbol-disjoint;
    * ties broken across a batch boundary are the one place the two can
    * legitimately differ (BpeSpec pins both behaviors). */
  def train(docs: DataFrame, nMerges: Int = 10, batchB: Int = 1)
  : (Seq[Merge], DataFrame) = {
    val (m, w, _) = trainRounds(docs, nMerges, batchB)
    (m, w)
  }

  /** [[train]] plus the number of pair-count rounds it ran — the
    * quantity batching exists to shrink (rounds ≈ nMerges/B when the
    * leaderboard stays disjoint, nMerges when it never is). */
  def trainRounds(docs: DataFrame, nMerges: Int = 10, batchB: Int = 1)
  : (Seq[Merge], DataFrame, Int) = {
    require(batchB >= 1, "batchB must be >= 1")
    var words = wordFreq(docs).withColumn("syms", charSyms(col("word")))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rounds = 0
    var sinceCkpt = 0
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val want = math.min(batchB, nMerges - merges.size)
      val top = pairCountsOfSyms(words)
        .orderBy(col("n").desc, col("left_sym"), col("right_sym"))
        .limit(want).collect() // bounded: at most batchB rows per round
      rounds += 1
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val it = top.iterator
        var open = true
        while (open && it.hasNext) {
          val row = it.next()
          val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
          // prefix rule: stop at the FIRST conflict (a symbol of an
          // already-picked pair, or a string colliding with a new
          // merged symbol) — do not skip past it
          if (used(l) || used(r)) open = false
          else {
            used ++= Seq(l, r, l + r)
            merges += Merge(merges.size + 1, l, r, l + r, n)
            words = words.withColumn("syms", applyMerge(col("syms"), l, r))
            sinceCkpt += 1
            if (sinceCkpt >= 4) { words = words.localCheckpoint(); sinceCkpt = 0 }
          }
        }
      }
    }
    (merges.toSeq, words, rounds)
  }

  /** Merge list as a DataFrame (for writing a vocab artifact). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Tokenize words with a learned merge list (apply merges in rank
    * order — the standard BPE encode). Distributed: one chained fold
    * per merge over the tokens' symbol arrays. */
  def encodeWords(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(words.withColumn("syms", charSyms(col("word")))) {
      (df, m) => df.withColumn("syms", applyMerge(col("syms"), m.left, m.right))
    }

  /** Sennrich et al. 2016's worked example corpus ({low×5, lower×2,
    * newest×6, widest×3}) as one document. */
  def sennrichText: String =
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")

  /** The first 8 merges [[train]] learns on [[sennrichText]] — pinned
    * as the default production vocab for [[encode]] so the DuckDB twin
    * can replay them as constants (BpeSpec asserts this constant IS
    * the trainer's output, so it stays a trained artifact, not an
    * arbitrary list). Matches the paper's worked example: (e,s),
    * (es,t), (est,</w>), then the l-o-w and n-e-w families. */
  def sennrichMerges: Seq[(String, String)] = Seq(
    ("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"),
    ("lo", "w"), ("e", "w"), ("ew", "est" + EOW), ("n", "ewest" + EOW))

  /** Per-word BPE token count as a pure map-side expression: each word
    * runs the charSyms → chained-merge fold, then sizes. No join, no
    * shuffle — what [[Chunking.chunkDocs]]'s bpeMerges flag plugs into
    * the chunk explode (the chunk table must never shuffle for a
    * join). */
  def bpeTokenCount(words: Column, merges: Seq[(String, String)]): Column =
    aggregate(
      transform(words, w =>
        size(merges.foldLeft(charSyms(w)) {
          case (s, (l, r)) => applyMerge(s, l, r) })),
      lit(0), (a, b) => a + b)

  /** BPE-encode the corpus: (doc_id, n_bpe_tokens) under a trained
    * merge list — the production tokenize step ([[train]] builds the
    * vocab; this applies it). The corpus collapses to DISTINCT words
    * first (the same 1000× reduction the trainer rides), each distinct
    * word encodes once through the merge fold, and per-doc counts come
    * from one (doc, word) ⋈ vocab join + groupBy — at 100 TB the fold
    * runs over ~10⁸ vocab rows, not 10¹¹ running words. */
  def encode(docs: DataFrame,
             merges: Seq[(String, String)] = sennrichMerges): DataFrame = {
    // dw feeds both the vocab distinct and the count join; measured at
    // sf0.1, materializing it does NOT pay (checkpoint cost ≥ the
    // second regexp scan), so the lineage stays lazy — and at scale a
    // checkpoint of the exploded words table would be a write
    // amplification, not a save
    val dw = graft.Tables.spread(docs).select(col("doc_id"),
      explode(graft.functions.TextFunctions.token_tfs(
        expr("regexp_extract_all(text, '\\\\S+', 0)"))).as("p"))
      .select(col("doc_id"), col("p.token").as("word"),
        col("p.tf").as("tf"))
    val vocab = dw.select(col("word")).distinct()
      .withColumn("syms", merges.foldLeft(charSyms(col("word"))) {
        case (s, (l, r)) => applyMerge(s, l, r) })
      .select(col("word"), size(col("syms")).as("n_syms"))
    // collapsed rows: each distinct (doc, word) joins once, weighted
    // by its run-length count — Σ tf·n_syms ≡ the per-occurrence sum
    val cnt = dw.join(vocab, "word")
      .groupBy("doc_id").agg(sum(col("n_syms") * col("tf")).as("n"))
    docs.select(col("doc_id")).join(cnt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_bpe_tokens"))
  }

  /** One merge round as a mk/tk/s CTE block: a match marks (sym,
    * next)=(l,r); within each maximal run of consecutive matches the
    * fold takes the odd-indexed ones (gaps-and-islands parity — [a,a,a]
    * under (a,a) → [aa,a], the reference semantics); taken rows become
    * the merged symbol and their right neighbor drops. `lSql`/`rSql`/
    * `mergedSql` are SQL expressions — constants for [[encodeSql]]
    * (pinned vocab) or scalar subqueries over the round's argmax pick
    * for [[trainSql]]; `carry` is extra per-word state columns (the
    * trainer threads `freq` through every round). Shared builder so
    * the two twins cannot drift apart. */
  private def mergeBlockSql(t: Int, lSql: String, rSql: String,
                            mergedSql: String, carry: String = "",
                            materialized: Boolean = false): String = {
    // The trainer references each round's state twice (pair counts +
    // rewrite) and its pick four times; without MATERIALIZED, DuckDB
    // inlines the CTE per reference and the plan re-expands the whole
    // prefix 2^rounds times (observed: fd exhaustion on the base scan
    // before any row is produced). The encode chain is linear and
    // needs no hint.
    val m = if (materialized) "MATERIALIZED " else ""
    s"""mk$t AS (
       |  SELECT word$carry, p, sym,
       |         CASE WHEN sym = $lSql AND
       |                   lead(sym) OVER (PARTITION BY word ORDER BY p) = $rSql
       |              THEN 1 ELSE 0 END AS m
       |  FROM s${t - 1}),
       |tk$t AS (
       |  SELECT word$carry, p, sym, m,
       |         CASE WHEN m = 1 AND
       |                   row_number() OVER (PARTITION BY word, grp, m
       |                                      ORDER BY p) % 2 = 1
       |              THEN 1 ELSE 0 END AS take
       |  FROM (SELECT *, sum(1 - m) OVER (PARTITION BY word ORDER BY p
       |                                   ROWS UNBOUNDED PRECEDING) AS grp
       |        FROM mk$t)),
       |s$t AS $m(
       |  SELECT word$carry, row_number() OVER (PARTITION BY word ORDER BY p) AS p,
       |         CASE WHEN take = 1 THEN $mergedSql ELSE sym END AS sym
       |  FROM (SELECT *, coalesce(lag(take) OVER (PARTITION BY word
       |                                           ORDER BY p), 0) AS ptake
       |        FROM tk$t)
       |  WHERE ptake = 0)""".stripMargin
  }

  /** DuckDB twin of [[encode]]: the merge fold replayed per pinned
    * merge — one [[mergeBlockSql]] block per merge, generated from the
    * same list the Spark side applies. */
  def encodeSql(merges: Seq[(String, String)] = sennrichMerges): String = {
    val mergeCtes = merges.zipWithIndex.map { case ((l, r), i) =>
      mergeBlockSql(i + 1, s"'$l'", s"'$r'", s"'${l + r}'")
    }.mkString(",\n")
    s"""WITH dw AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS word
       |  FROM documents),
       |s0 AS (
       |  SELECT word, unnest(range(1, len(s) + 1)) AS p, unnest(s) AS sym
       |  FROM (SELECT word, list_append(string_split(word, ''), '$EOW') AS s
       |        FROM (SELECT DISTINCT word FROM dw))),
       |$mergeCtes,
       |wc AS (
       |  SELECT word, count(*) AS n_syms FROM s${merges.size} GROUP BY word),
       |cnt AS (
       |  SELECT dw.doc_id, sum(wc.n_syms) AS n
       |  FROM dw JOIN wc USING (word) GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents d LEFT JOIN cnt ON cnt.doc_id = d.doc_id""".stripMargin
  }

  /** Tokenizer fertility by language — the tokenizer-evaluation read
    * every multilingual pipeline runs before committing to a vocab
    * (fertility = subword tokens per word; chars per token is the
    * compression view): per predicted language, corpus totals and the
    * two integer-ppm ratios under the given merge list. A vocabulary
    * trained on one language's text over-fragments the others; this
    * is the table that shows it per shard/corpus.
    *
    * Scale shape: rides [[encode]]'s distinct-word fold (the corpus
    * tokenizes once, ~10⁸ vocab rows at 100 TB, never 10¹¹ running
    * words); language-ID and word counts are map-side scalars; one
    * #langs-row aggregate. All-integer output — hash-exact across
    * engines. */
  def fertility(docs: DataFrame,
                merges: Seq[(String, String)] = sennrichMerges): DataFrame = {
    val enc = encode(docs, merges)
    graft.Tables.spread(docs)
      .select(col("doc_id"), TextAnalysis.langPred.as("lang_pred"),
        length(col("text")).cast("long").as("n_chars"),
        expr("regexp_count(text, '\\\\S+')").cast("long").as("n_words"))
      .join(enc, "doc_id")
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
        expr("sum(n_chars) * 1000000 div greatest(sum(n_bpe_tokens), 1)")
          .as("chars_per_token_ppm"),
        expr("sum(n_bpe_tokens) * 1000000 div greatest(sum(n_words), 1)")
          .as("tokens_per_word_ppm"))
  }

  /** DuckDB twin of [[fertility]]: [[encodeSql]] nested as the encode
    * CTE, the language-ID CASE inline, integer ppm ratios. */
  def fertilitySql(merges: Seq[(String, String)] = sennrichMerges): String =
    s"""WITH enc AS (SELECT * FROM (
       |${encodeSql(merges)}
       |)),
       |base AS (
       |  SELECT doc_id, ${TextAnalysis.langPredSql} AS lang_pred,
       |         CAST(length(text) AS BIGINT) AS n_chars,
       |         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words
       |  FROM main.documents)
       |SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |       CAST(sum(n_words) AS BIGINT) AS n_words,
       |       CAST(sum(n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       |       CAST(sum(n_chars) * 1000000 //
       |            greatest(sum(n_bpe_tokens), 1) AS BIGINT) AS chars_per_token_ppm,
       |       CAST(sum(n_bpe_tokens) * 1000000 //
       |            greatest(sum(n_words), 1) AS BIGINT) AS tokens_per_word_ppm
       |FROM base JOIN enc USING (doc_id)
       |GROUP BY 1""".stripMargin

  /** DuckDB twin of [[trainRounds]] (batchB = 1): nMerges unrolled
    * rounds, each one = frequency-weighted pair counts over the
    * current symbol state, a deterministic argmax `pick` (count desc,
    * pair asc — the trainer's exact ordering), and a [[mergeBlockSql]]
    * rewrite whose merge symbols are scalar subqueries over that pick.
    * The oracle RE-LEARNS the vocabulary from scratch — a trainer bug
    * (wrong weighting, wrong tie-break, wrong fold semantics) lands as
    * a hash mismatch on whichever round first diverges, and every
    * later round amplifies it (state is cumulative). An exhausted
    * corpus (no pairs left at round t) yields an empty pick whose
    * NULL-comparing rewrite is a no-op and whose output row vanishes
    * from the UNION — mirroring the trainer's early stop. */
  def trainSql(nMerges: Int = 8): String = {
    val rounds = (1 to nMerges).map { t =>
      s"""pc$t AS (
         |  SELECT freq, sym AS l,
         |         lead(sym) OVER (PARTITION BY word ORDER BY p) AS r
         |  FROM s${t - 1}),
         |cnt$t AS (
         |  SELECT l, r, CAST(sum(freq) AS BIGINT) AS n
         |  FROM pc$t WHERE r IS NOT NULL GROUP BY 1, 2),
         |pick$t AS MATERIALIZED (
         |  SELECT l, r, n FROM cnt$t ORDER BY n DESC, l, r LIMIT 1),
         |${mergeBlockSql(t, s"(SELECT l FROM pick$t)", s"(SELECT r FROM pick$t)",
                          s"(SELECT l || r FROM pick$t)", carry = ", freq",
                          materialized = true)}""".stripMargin
    }.mkString(",\n")
    val out = (1 to nMerges).map { t =>
      s"""SELECT CAST($t AS INT) AS rank, l AS "left", r AS "right",
         |       l || r AS merged, n FROM pick$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH wf AS (
       |  SELECT word, count(*) AS freq
       |  FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS word
       |        FROM documents) GROUP BY 1),
       |s0 AS MATERIALIZED (
       |  SELECT word, freq, unnest(range(1, len(s) + 1)) AS p, unnest(s) AS sym
       |  FROM (SELECT word, freq,
       |               list_append(string_split(word, ''), '$EOW') AS s
       |        FROM wf)),
       |$rounds
       |$out""".stripMargin
  }
}
