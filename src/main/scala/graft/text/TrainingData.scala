package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The whole training-data pipeline as one entry point — the library's
  * "main()" for corpus preparation, composing the oracle-checked
  * stages end-to-end:
  *
  *   1. [[Curate.curate]]   — score → gate → exact dedup → keep-best
  *      near-dedup (the surviving corpus, with curation metadata)
  *   2. [[Chunking.chunkDocs]] — context-window chunks with overlap
  *      over the survivors' text
  *   3. deterministic training order — each chunk gets a salted-hash
  *      (shard, position) via the same RNG-free construction as
  *      [[graft.operators.Sampling.shuffleOrder]]; a new salt is a new
  *      epoch permutation
  *
  * Output, one row per training chunk:
  *   (doc_id, chunk_idx, chunk_text, n_tokens, lang_pred, quality_pm,
  *    shard, position)
  *
  * Each stage is individually hash-checked against DuckDB (q_curate,
  * q_chunk, q_shuffle_order); the composition adds no new distributed
  * machinery — curate's survivors join their text (broadcast-sized
  * drop list logic inside curate), chunking is map-side, and the
  * epoch order is one rank window per shard. The curated corpus is
  * the natural artifact boundary: write it once, re-chunk/re-shuffle
  * per training configuration without re-running dedup. */
object TrainingData {

  def prepare(docs: DataFrame,
              minQualityPm: Long = 600,
              langs: Seq[String] = Seq("en", "de"),
              chunkTokens: Int = 64, overlap: Int = 8,
              nShards: Int = 8, salt: String = "epoch0"): DataFrame = {
    val kept = Curate.curate(docs, minQualityPm, langs)
    val keptDocs = docs.join(kept.select(col("doc_id"), col("lang_pred"),
      col("quality_pm")), "doc_id")
    val chunks = Chunking.chunkDocs(
        keptDocs.select(col("doc_id"), col("text")), chunkTokens, overlap)
      .join(keptDocs.select(col("doc_id"), col("lang_pred"), col("quality_pm")),
        "doc_id")
    val h = conv(substring(md5(concat_ws(":", lit(salt),
      col("doc_id").cast("string"), col("chunk_idx").cast("string"))), 1, 15),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"), col("chunk_idx"))
    chunks
      .withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("position", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"),
        col("n_tokens"), col("lang_pred"), col("quality_pm"),
        col("shard"), col("position"))
  }
}
