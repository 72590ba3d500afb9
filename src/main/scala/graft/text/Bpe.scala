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

  /** word → n_words frequency table (the only full-corpus pass). */
  def wordFreq(docs: DataFrame): DataFrame =
    graft.Tables.spread(docs)
      .select(explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

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
    * the word table, ONE collected argmax row (ties break on the pair
    * for determinism), distributed fold rewrite. localCheckpoint every
    * few rounds truncates the otherwise linearly-growing lineage of
    * nested higher-order folds. Returns the merge list and the final
    * word → symbols table. */
  def train(docs: DataFrame, nMerges: Int = 10)
  : (Seq[Merge], DataFrame) = {
    var words = wordFreq(docs).withColumn("syms", charSyms(col("word")))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    while (round < nMerges) {
      val top = pairCountsOfSyms(words)
        .orderBy(col("n").desc, col("left_sym"), col("right_sym"))
        .limit(1).collect() // exactly one row per round, by construction
      if (top.isEmpty) { round = nMerges }
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(merges.size + 1, l, r, l + r, n)
        words = words.withColumn("syms", applyMerge(col("syms"), l, r))
        round += 1
        if (round % 4 == 0) words = words.localCheckpoint()
      }
    }
    (merges.toSeq, words)
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
}
