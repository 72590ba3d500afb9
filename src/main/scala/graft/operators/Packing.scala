package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Training-set assembly: deterministic sharding, concat-and-chunk
  * sequence packing, and quality-quantile bucketing — the last mile of
  * a pretraining data pipeline (corpus → fixed-token-budget chunks and
  * curriculum buckets).
  */
object Packing {

  /** Shard + pack: docs are assigned a deterministic shard
    * (doc_id mod nShards — swap in a hash for unbalanced id spaces),
    * ordered within the shard by doc_id, and the running token count
    * places each doc's start in a `tokenBudget`-sized chunk:
    * chunk = tokens-before div budget — exactly GPT-style
    * "concatenate the stream, cut every budget tokens" packing.
    * Scale: the window sorts WITHIN shard partitions only (one hash
    * shuffle on shard, no global sort); nShards scales with the
    * cluster, budget is the model's context length.
    *
    * `bpeMerges`: when set, the budget means model tokens under that
    * trained merge list, not whitespace words — which is what a
    * context-length budget actually is. Counts come from
    * [[graft.text.Bpe.encode]]'s distinct-vocab path: each distinct
    * word runs the merge fold ONCE and per-doc counts are a vocab
    * join, instead of folding every running word through the merge
    * expression (8 700× fewer fold evaluations at sf0.1 — 31 distinct
    * words vs 270k running. Wall-clock there is join-overhead-bound
    * either way, ~q_bpe_encode's own cost; at a real 10⁵-word vocab
    * over 10¹¹ running words the fold reduction is the difference).
    * The packing window itself adds ~nothing (q_pack_shards' cost). */
  def packShards(docs: DataFrame, nShards: Int = 8,
                 tokenBudget: Long = 2048L,
                 bpeMerges: Option[Seq[(String, String)]] = None): DataFrame = {
    val counts = bpeMerges match {
      case None =>
        graft.Tables.spread(docs).select(col("doc_id"),
          regexp_count(col("text"), lit("\\S+")).cast("long").as("n_tokens"))
      case Some(ms) =>
        graft.text.Bpe.encode(docs, ms)
          .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
    }
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .select(col("doc_id"), pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        col("n_tokens"))
      .withColumn("chunk",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / tokenBudget)
          .cast("long"))
  }

  def packShardsSql(nShards: Int = 8, tokenBudget: Long = 2048L): String =
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % $nShards AS shard,
       |         len(regexp_extract_all(text, '\\S+')) AS n_tokens
       |  FROM documents)
       |SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
       |              ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |              AND 1 PRECEDING), 0) // $tokenBudget AS BIGINT) AS chunk
       |FROM t""".stripMargin

  /** DuckDB twin of [[packShards]] with `bpeMerges` set: the per-doc
    * BPE count comes from [[graft.text.Bpe.encodeSql]]'s merge replay,
    * embedded as a subquery, with the identical packing window on top. */
  def packShardsBpeSql(nShards: Int = 8, tokenBudget: Long = 2048L,
                       merges: Seq[(String, String)] =
                         graft.text.Bpe.sennrichMerges): String =
    s"""WITH t AS (
       |  SELECT doc_id, doc_id % $nShards AS shard,
       |         n_bpe_tokens AS n_tokens
       |  FROM (${graft.text.Bpe.encodeSql(merges)}))
       |SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
       |              ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |              AND 1 PRECEDING), 0) // $tokenBudget AS BIGINT) AS chunk
       |FROM t""".stripMargin

  /** Quality-curriculum buckets: ntile(k) of the integer quality score
    * within each language stratum (deterministic (quality, doc_id)
    * order). Partitioned windows shuffle once on lang and sort within —
    * no global sort; at extreme per-stratum cardinality the split
    * points come from approx quantiles instead (documented trade). */
  def qualityBuckets(docs: DataFrame, k: Int = 4): DataFrame =
    graft.Tables.spread(docs)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityExpr.as("quality_pm"))
      .withColumn("bucket",
        ntile(k).over(Window.partitionBy(col("lang"))
          .orderBy(col("quality_pm"), col("doc_id"))).cast("int"))

  def qualityBucketsSql(k: Int = 4): String = {
    // DuckDB lacks regexp_count; reuse the documented equivalent fragment
    val quality = graft.text.TextAnalysis.qualityScoreSql
    s"""WITH q AS ($quality)
       |SELECT q.doc_id, d.lang, q.quality_pm,
       |       CAST(ntile($k) OVER (PARTITION BY d.lang
       |              ORDER BY q.quality_pm, q.doc_id) AS INT) AS bucket
       |FROM q JOIN documents d ON d.doc_id = q.doc_id""".stripMargin
  }
}
