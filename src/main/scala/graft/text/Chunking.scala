package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking with overlap: split each document into
  * fixed-token-budget chunks where consecutive chunks share `overlap`
  * tokens — the preprocessing step between curation and sequence
  * packing (a retrieval/pretraining corpus is chunked so no training
  * sequence spans a document boundary and boundary context isn't
  * lost).
  *
  * Chunk i covers tokens [i·stride+1 .. i·stride+chunkTokens]
  * (stride = chunkTokens − overlap); the last chunk may be short, and
  * a document at most `chunkTokens` long is exactly one chunk (no
  * redundant fully-contained tail). Pure map-side: one whitespace
  * tokenization + one bounded explode per document, no shuffle, no
  * window function — the 100 TB plan is the scan plan.
  */
object Chunking {

  /** Any columns besides (doc_id, text) ride along unchanged, appended
    * after n_tokens — so a fused pipeline (curate → chunk) carries its
    * per-doc metadata (lang_pred, quality_pm) THROUGH the explode
    * instead of re-joining the chunk table with the corpus afterwards;
    * at 100 TB chunks are the biggest table in the pipeline and that
    * re-join would be its largest avoidable shuffle. */
  /** `bpeMerges`: when set, n_tokens reports the chunk's BPE token
    * count under that trained merge list ([[Bpe.bpeTokenCount]] — a
    * pure map-side expression over the chunk's words, so the
    * zero-chunk-join plan shape is preserved even with the flag on).
    * Chunk BOUNDARIES stay word-based either way: the window budget is
    * a whitespace-token budget; only the reported count upgrades. */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 64,
                overlap: Int = 8,
                bpeMerges: Option[Seq[(String, String)]] = None): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    val meta = docs.columns.filter(c => c != "doc_id" && c != "text").toSeq
    // the generated columns would silently shadow (or ambiguate) a
    // same-named ride-along — reject up front rather than emit a frame
    // whose col("n_tokens") throws AMBIGUOUS_REFERENCE downstream
    val reserved = Set("w", "c", "chunk_idx", "chunk_text", "n_tokens")
    val clash = meta.filter(reserved)
    require(clash.isEmpty,
      s"chunkDocs ride-along columns collide with generated names: ${clash.mkString(", ")}")
    val carry = (Seq("doc_id") ++ meta).map(col)
    graft.Tables.spread(docs)
      .select(carry :+ expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"): _*)
      .select(carry :+ posexplode(expr(
        s"""transform(
           |  sequence(0, CASE WHEN size(w) <= $chunkTokens THEN 0
           |                   ELSE (size(w) - $chunkTokens + $stride - 1) div $stride END),
           |  i -> struct(
           |    array_join(slice(w, i * $stride + 1, $chunkTokens), ' ') AS chunk_text,
           |    size(slice(w, i * $stride + 1, $chunkTokens)) AS n_tokens))"""
          .stripMargin)).as(Seq("chunk_idx", "c")): _*)
      .select(Seq(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.chunk_text").as("chunk_text"),
        bpeMerges.fold(col("c.n_tokens").cast("long")) { ms =>
          Bpe.bpeTokenCount(
            expr("regexp_extract_all(c.chunk_text, '\\\\S+', 0)"), ms)
            .cast("long")
        }.as("n_tokens")) ++ meta.map(col): _*)
  }

  def chunkDocsSql(chunkTokens: Int = 64, overlap: Int = 8): String = {
    val stride = chunkTokens - overlap
    s"""SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       |       array_to_string(w[i * $stride + 1 : i * $stride + $chunkTokens], ' ') AS chunk_text,
       |       CAST(len(w[i * $stride + 1 : i * $stride + $chunkTokens]) AS BIGINT) AS n_tokens
       |FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w,
       |        unnest(generate_series(0,
       |          CASE WHEN len(regexp_extract_all(text, '\\S+')) <= $chunkTokens THEN 0
       |               ELSE (len(regexp_extract_all(text, '\\S+')) - $chunkTokens + $stride - 1) // $stride END)) AS i
       |      FROM documents)""".stripMargin
  }
}
