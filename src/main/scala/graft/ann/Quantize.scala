package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization + quantized ANN with exact
  * re-rank — the storage/bandwidth scale path for similarity search.
  *
  * At 100 TB an Array[Float] embedding column is 4 bytes/dim; symmetric
  * int8 quantization stores 1 byte/dim + one float scale per vector
  * (≈4× less scan I/O and shuffle), and the candidate generation pass
  * runs entirely on the quantized ints. The standard two-stage ANN
  * recipe (FAISS's IVF-SQ8 / ScaNN shape): rank by quantized inner
  * product, keep `refine × k` candidates, re-rank just those with the
  * exact float cosine.
  *
  * Everything is engine-replicable arithmetic: scale = max|v| / 127
  * (exact double ops), q_i = floor(v_i/scale + 0.5) (floor, not
  * HALF_UP/HALF_EVEN round, which differ across engines), and the
  * quantized dot is an integer sum (≤ 127²·dim ≪ 2^53 — exact even in
  * a double accumulator, so any engine computes it bit-identically).
  */
object Quantize {

  private def asDouble(c: Column): Column = c.cast("double")

  /** Per-vector symmetric scale: max|v|/127, 1.0 for the zero vector. */
  def scaleOf(emb: Column): Column = {
    val mx = aggregate(transform(emb, v => abs(asDouble(v))), lit(0.0),
      (a, b) => greatest(a, b))
    when(mx === 0.0, 1.0).otherwise(mx / 127.0)
  }

  /** int8 code vector: floor(v/scale + 0.5) ∈ [−127, 127]. */
  def codesOf(emb: Column, scale: Column): Column =
    transform(emb, v => floor(asDouble(v) / scale + 0.5).cast("int"))

  /** (vec_id, label, scale, qvec) — the stored quantized form. One
    * codegen'd pass ([[graft.functions.QuantizeCodes]]); [[scaleOf]]/
    * [[codesOf]] remain as the reference formulation (bit-identical,
    * QuantizeSpec-asserted). */
  def quantize(embs: DataFrame): DataFrame = {
    val q = graft.functions.VectorFunctions.quantize_codes(col("embedding"))
    embs.select(col("vec_id"), col("label"),
      q.getField("scale").as("scale"), q.getField("qvec").as("qvec"))
  }

  /** Scalarized audit view (array columns don't survive generic result
    * hashing): the scale plus an md5 digest of the code vector. */
  def quantizeDigest(embs: DataFrame): DataFrame =
    quantize(embs).select(col("vec_id"), col("scale"),
      md5(concat_ws(",", col("qvec"))).as("qvec_md5"))

  def quantizeDigestSql: String =
    s"""WITH q AS (
       |  SELECT vec_id,
       |    CASE WHEN list_aggregate(list_transform(embedding,
       |           x -> abs(CAST(x AS DOUBLE))), 'max') = 0 THEN 1.0
       |         ELSE list_aggregate(list_transform(embedding,
       |           x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 END AS scale,
       |    embedding
       |  FROM embeddings)
       |SELECT vec_id, scale,
       |  md5(array_to_string(list_transform(embedding,
       |    x -> CAST(CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INTEGER)
       |              AS VARCHAR)), ',')) AS qvec_md5
       |FROM q""".stripMargin

  /** Integer dot product of two code vectors (exact in any engine):
    * codegen'd primitive loop ([[graft.functions.DotProductI]]) — the
    * zip_with/aggregate formulation evaluates interpreted lambdas per
    * element, which dominates the corpus-wide candidate pass. */
  def qdot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_i(a, b)

  /** Two-stage quantized KNN: stage 1 ranks by the quantized inner
    * product (integer math over 1-byte codes — the cheap pass over the
    * whole corpus); stage 2 re-ranks the surviving refine×k candidates
    * with the exact float cosine. Queries broadcast; the corpus never
    * shuffles — only (query, candidate) pairs do. */
  def quantKnn(embs: DataFrame, queryMaxId: Long = 10, k: Int = 5,
               refine: Int = 4): DataFrame = {
    val q = quantize(embs)
    val corpus = q.select(col("vec_id"), col("scale"), col("qvec"))
    val queries = corpus.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("scale").as("q_scale"),
        col("qvec").as("q_qvec"))
    val approx = broadcast(queries)
      .join(corpus, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (qdot(col("q_qvec"), col("qvec")) * col("q_scale") * col("scale"))
          .as("approx_dot"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dot").desc, col("vec_id"))
    val candidates = approx.withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("vec_id"))
    // exact re-rank of the survivors only
    val full = embs.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    val qFull = full.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    candidates
      .join(broadcast(qFull), Seq("query_id"))
      .join(full, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(Similarity.dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm")), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
  }

  def quantKnnSql(queryMaxId: Long = 10, k: Int = 5, refine: Int = 4): String =
    s"""WITH q AS (
       |  SELECT vec_id,
       |    CASE WHEN list_aggregate(list_transform(embedding,
       |           x -> abs(CAST(x AS DOUBLE))), 'max') = 0 THEN 1.0
       |         ELSE list_aggregate(list_transform(embedding,
       |           x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 END AS scale,
       |    embedding
       |  FROM embeddings),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, scale,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS qvec
       |  FROM q),
       |approx AS (
       |  SELECT a.vec_id AS query_id, c.vec_id,
       |         list_dot_product(a.qvec, c.qvec) * a.scale * c.scale AS approx_dot
       |  FROM codes a JOIN codes c ON c.vec_id <> a.vec_id
       |  WHERE a.vec_id < $queryMaxId),
       |cand AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |           row_number() OVER (PARTITION BY query_id
       |                              ORDER BY approx_dot DESC, vec_id) AS arank
       |    FROM approx) WHERE arank <= ${k * refine}),
       |exact AS (
       |  SELECT cand.query_id, cand.vec_id,
       |         round(list_dot_product(qe.embedding, ce.embedding) /
       |               (sqrt(list_dot_product(qe.embedding, qe.embedding)) *
       |                sqrt(list_dot_product(ce.embedding, ce.embedding))), 4) AS cos_sim
       |  FROM cand
       |  JOIN embeddings qe ON qe.vec_id = cand.query_id
       |  JOIN embeddings ce ON ce.vec_id = cand.vec_id)
       |SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, vec_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, vec_id) AS rank
       |  FROM exact) WHERE rank <= $k""".stripMargin
}
