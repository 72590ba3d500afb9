package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) — the standard ANN
  * compression layer: split each vector into `m` subvectors, learn a
  * small per-subspace codebook (integer Lloyd, the [[KMeans]] loop with
  * a `sub` key), and store each vector as `m` small centroid ids. A
  * 64-dim float vector becomes m=8 codes — the representation that
  * makes billion-vector indexes fit in memory; IVF+PQ is the classic
  * pairing ([[IvfKnn]] provides the IVF half).
  *
  * Search here is SDC (symmetric distance): both sides quantized, so
  * every distance is a lookup-table sum of per-subspace integer
  * squared distances — bit-identical across engines, like the rest of
  * the ANN family (the asymmetric variant swaps the query's codes for
  * its raw subvectors; same plan, float tables).
  *
  * Scale shape: codebooks are m·k rows (broadcast everywhere); the
  * corpus is touched by pure map-side subvector explodes plus one
  * groupBy(vec) to assemble codes; the query pass joins the corpus
  * CODE table (m rows/vec) with a broadcast |Q|·m·k distance table and
  * shuffles only (query, vec) partial sums. Nothing ever pairs
  * corpus×corpus.
  */
object Pq {

  /** The ONE source of truth for the subspace count — the `*With`
    * search variants join codes on (sub, code), so an m that disagrees
    * with the m the index was built at would silently sum a subset of
    * the subspace distances; every caller (incl.
    * [[Similarity.annRecall]]) takes m from here. */
  val defaultM = 8

  // shared with the flat clustering (one definition to maintain)
  private def d2(a: String, c: String): Column = KMeans.dist2(a, c)

  /** (vec_id, sub, svec): the quantized vector split into m equal
    * subvectors — one map-side explode, no shuffle. */
  private def subvectors(embs: DataFrame, m: Int): DataFrame =
    Quantize.quantize(embs).select(col("vec_id"), col("qvec"))
      .select(col("vec_id"), posexplode(expr(
        s"""transform(sequence(0, $m - 1),
           |  j -> slice(qvec, j * (size(qvec) div $m) + 1, size(qvec) div $m))"""
          .stripMargin)).as(Seq("sub", "svec")))

  /** Per-subspace codebooks after `iters` Lloyd rounds: (sub, cid,
    * cvec), seeded per subspace by the k lowest vec_ids' subvectors
    * (same deterministic convention as [[KMeans.assign]]). */
  def codebooks(embs: DataFrame, m: Int = defaultM, k: Int = 16,
                iters: Int = 2): DataFrame = {
    val subs = subvectors(embs, m)
    val wSeed = Window.partitionBy(col("sub")).orderBy(col("vec_id"))
    var cents = subs.withColumn("rn", row_number().over(wSeed))
      .filter(col("rn") <= k)
      .select(col("sub"), col("vec_id").as("cid"), col("svec").as("cvec"))
    val wAsg = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("dd"), col("cid"))
    for (_ <- 1 until iters) {
      val assigned = subs.join(broadcast(cents), "sub")
        .withColumn("dd", d2("svec", "cvec"))
        .withColumn("rn", row_number().over(wAsg)).filter(col("rn") === 1)
      cents = assigned
        .select(col("sub"), col("cid"), posexplode(col("svec")).as(Seq("pos", "code")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(sum(col("code")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("sub"), col("cid"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"),
            floor(col("s").cast("double") / col("n") + 0.5).cast("int").as("code")))),
          e => e.getField("code")).as("cvec"))
    }
    cents
  }

  /** PQ encoding: (vec_id, sub, code) — each subvector's nearest
    * codebook centroid (squared-distance argmin, cid tiebreak). */
  def encode(embs: DataFrame, m: Int = defaultM, k: Int = 16,
             iters: Int = 2): DataFrame =
    encodeWith(embs, codebooks(embs, m, k, iters), m)

  /** [[encode]] against an already-built codebook — search entry
    * points build the codebook ONCE (materialized: it is m·k rows but
    * its lineage is the whole Lloyd chain) and feed it to both the
    * encoder and the distance tables, instead of re-planning the
    * corpus-wide training per consumer. */
  def encodeWith(embs: DataFrame, cb: DataFrame, m: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("dd"), col("cid"))
    subvectors(embs, m).join(broadcast(cb), "sub")
      .withColumn("dd", d2("svec", "cvec"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("cid").as("code"))
  }

  /** SDC top-k: per query, the lookup-table distance
    * Σ_sub d²(query_subvec, centroid[code]) over the encoded corpus.
    * Output: (query_id, vec_id, adist2, rank). */
  def pqKnn(embs: DataFrame, queryMaxId: Long = 10, topK: Int = 5,
            m: Int = defaultM, k: Int = 16, iters: Int = 2): DataFrame = {
    val cb = codebooks(embs, m, k, iters).localCheckpoint()
    pqKnnWith(embs, cb, encodeWith(embs, cb, m), queryMaxId, topK, m)
  }

  /** [[pqKnn]] against a prebuilt index (codebook + codes) — at scale
    * those ARE the stored artifacts, and diagnostics that run several
    * PQ searches ([[Similarity.annRecall]]) share one training. */
  def pqKnnWith(embs: DataFrame, cb: DataFrame, codes: DataFrame,
                queryMaxId: Long = 10, topK: Int = 5, m: Int = defaultM): DataFrame = {
    val dt = subvectors(embs, m).filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("sub"), col("svec"))
      .join(broadcast(cb), "sub")
      .select(col("query_id"), col("sub"), col("cid").as("code"),
        d2("svec", "cvec").as("pd2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist2"), col("vec_id"))
    codes.join(broadcast(dt), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd2")).as("adist2"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
  }

  /** IVF+PQ with exact re-rank — the production pairing this module
    * exists for: the query probes its `nprobe` nearest IVF cells
    * ([[IvfKnn]] — at scale the cell id is a storage partition column,
    * so probing is partition pruning), candidates inside those cells
    * are ranked by the PQ lookup-table distance (reads CODES, never
    * raw vectors — the memory story), and the SDC top `topK·refine`
    * re-rank with the exact float cosine ([[Quantize.quantKnn]]'s
    * two-stage shape). Output matches [[Similarity.knnBrute]].
    *
    * Scale shape: per query the raw-vector work is topK·refine rows;
    * everything corpus-wide touches only the m-codes table, joined
    * against broadcast probe lists and broadcast distance tables. */
  def ivfPqKnn(embs: DataFrame, queryMaxId: Long = 10, topK: Int = 5,
               kCells: Int = 16, nprobe: Int = 4,
               m: Int = defaultM, k: Int = 16, iters: Int = 2,
               refine: Int = 8): DataFrame = {
    val cb = codebooks(embs, m, k, iters).localCheckpoint()
    ivfPqKnnWith(embs, cb, encodeWith(embs, cb, m), queryMaxId, topK,
      kCells, nprobe, m, refine)
  }

  /** [[ivfPqKnn]] against a prebuilt index (see [[pqKnnWith]]). */
  def ivfPqKnnWith(embs: DataFrame, cb: DataFrame, codes: DataFrame,
                   queryMaxId: Long = 10, topK: Int = 5,
                   kCells: Int = 16, nprobe: Int = 4,
                   m: Int = defaultM, refine: Int = 8): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val cents = IvfKnn.centroids(embs, kCells)
    val assigned = IvfKnn.assign(embs, cents).select(col("vec_id"), col("cell"))
    val probes = embs.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        IvfKnn.rankedCells(emb, cents).take(nprobe).map(c => (id, c)) }
      .toDF("query_id", "cell")
    val dt = subvectors(embs, m).filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("sub"), col("svec"))
      .join(broadcast(cb), "sub")
      .select(col("query_id"), col("sub"), col("cid").as("code"),
        d2("svec", "cvec").as("pd2"))
    // each vector lives in exactly one cell → (query, vec) is unique
    val cand = broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adist2"), col("vec_id"))
    val short = cand.join(codes, "vec_id")
      .join(broadcast(dt), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pd2")).as("adist2"))
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= topK * refine)
      .select(col("query_id"), col("vec_id"))
    val full = embs.select(col("vec_id"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    val qFull = full.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    short.join(broadcast(qFull), Seq("query_id"))
      .join(full, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(Similarity.dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm")), 4).as("cos_sim"))
      .withColumn("rank", row_number().over(wE).cast("int"))
      .filter(col("rank") <= topK)
  }

  /** DuckDB twin of [[ivfPqKnn]]: the PQ CTE chain + the IVF cell
    * CTEs + SDC shortlist + exact re-rank, each block identical to
    * its standalone oracle. */
  def ivfPqKnnSql(queryMaxId: Long = 10, topK: Int = 5,
                  kCells: Int = 16, nprobe: Int = 4,
                  m: Int = defaultM, k: Int = 16, iters: Int = 2,
                  refine: Int = 8): String = {
    require(iters == 2, "oracle spells out the iters=2 case")
    def cosSql(a: String, b: String) =
      s"""list_dot_product($a, $b) /
         |             (sqrt(list_dot_product($a, $a)) *
         |              sqrt(list_dot_product($b, $b)))""".stripMargin
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) /
       |      (CASE WHEN list_aggregate(list_transform(embedding,
       |              x -> abs(CAST(x AS DOUBLE))), 'max') = 0 THEN 1.0
       |            ELSE list_aggregate(list_transform(embedding,
       |              x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 END)
       |      + 0.5) AS INTEGER)) AS qvec
       |  FROM embeddings),
       |sv AS (
       |  SELECT vec_id, j.sub,
       |         qvec[j.sub * (len(qvec) // $m) + 1 :
       |              j.sub * (len(qvec) // $m) + (len(qvec) // $m)] AS svec
       |  FROM q CROSS JOIN (SELECT unnest(range(0, $m)) AS sub) j),
       |c0 AS (
       |  SELECT sub, vec_id AS cid, svec AS cvec FROM sv
       |  QUALIFY row_number() OVER (PARTITION BY sub ORDER BY vec_id) <= $k),
       |a1 AS (
       |  SELECT vec_id, sub, cid, svec FROM (
       |    SELECT s.vec_id, s.sub, c.cid, s.svec,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
       |        list_dot_product(s.svec, s.svec) + list_dot_product(c.cvec, c.cvec)
       |          - 2 * list_dot_product(s.svec, c.cvec), c.cid) AS rn
       |    FROM sv s JOIN c0 c USING (sub)) WHERE rn = 1),
       |px AS (
       |  SELECT sub, cid, unnest(svec) AS code,
       |         unnest(range(1, len(svec) + 1)) AS pos
       |  FROM a1),
       |c1 AS (
       |  SELECT sub, cid, list(code ORDER BY pos) AS cvec FROM (
       |    SELECT sub, cid, pos,
       |           CAST(floor(CAST(sum(code) AS DOUBLE) / count(*) + 0.5) AS INTEGER) AS code
       |    FROM px GROUP BY sub, cid, pos)
       |  GROUP BY sub, cid),
       |codes AS (
       |  SELECT vec_id, sub, cid AS code FROM (
       |    SELECT s.vec_id, s.sub, c.cid,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
       |        list_dot_product(s.svec, s.svec) + list_dot_product(c.cvec, c.cvec)
       |          - 2 * list_dot_product(s.svec, c.cvec), c.cid) AS rn
       |    FROM sv s JOIN c1 c USING (sub)) WHERE rn = 1),
       |dt AS (
       |  SELECT s.vec_id AS query_id, s.sub, c.cid AS code,
       |         list_dot_product(s.svec, s.svec) + list_dot_product(c.cvec, c.cvec)
       |           - 2 * list_dot_product(s.svec, c.cvec) AS pd2
       |  FROM sv s JOIN c1 c USING (sub)
       |  WHERE s.vec_id < $queryMaxId),
       |hashed AS (
       |  SELECT vec_id, embedding,
       |         ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM embeddings),
       |cents AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell,
       |         embedding AS c_emb
       |  FROM hashed ORDER BY h, vec_id LIMIT $kCells),
       |cellrank AS (
       |  SELECT e.vec_id, e.cell FROM (
       |    SELECT e.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cents c) e
       |  WHERE e.rn = 1),
       |proberank AS (
       |  SELECT e.vec_id, c.cell,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.cell) AS rn
       |  FROM embeddings e CROSS JOIN cents c
       |  WHERE e.vec_id < $queryMaxId),
       |cand AS (
       |  SELECT p.vec_id AS query_id, a.vec_id
       |  FROM (SELECT vec_id, cell FROM proberank WHERE rn <= $nprobe) p
       |  JOIN cellrank a ON a.cell = p.cell AND a.vec_id <> p.vec_id),
       |sdc AS (
       |  SELECT cand.query_id, cand.vec_id,
       |         CAST(sum(dt.pd2) AS BIGINT) AS adist2
       |  FROM cand
       |  JOIN codes ON codes.vec_id = cand.vec_id
       |  JOIN dt ON dt.query_id = cand.query_id
       |         AND dt.sub = codes.sub AND dt.code = codes.code
       |  GROUP BY 1, 2),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |           row_number() OVER (PARTITION BY query_id
       |                              ORDER BY adist2, vec_id) AS arank
       |    FROM sdc) WHERE arank <= ${topK * refine}),
       |exact AS (
       |  SELECT short.query_id, short.vec_id,
       |         round(list_dot_product(qe.embedding, ce.embedding) /
       |               (sqrt(list_dot_product(qe.embedding, qe.embedding)) *
       |                sqrt(list_dot_product(ce.embedding, ce.embedding))), 4) AS cos_sim
       |  FROM short
       |  JOIN embeddings qe ON qe.vec_id = short.query_id
       |  JOIN embeddings ce ON ce.vec_id = short.vec_id)
       |SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
       |  SELECT query_id, vec_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, vec_id) AS rank
       |  FROM exact) WHERE rank <= $topK""".stripMargin
  }

  /** DuckDB twin of [[pqKnn]] (iters=2 spelled out, like
    * [[KMeans.assignSql]]). */
  def pqKnnSql(queryMaxId: Long = 10, topK: Int = 5, m: Int = defaultM,
               k: Int = 16, iters: Int = 2): String = {
    require(iters == 2, "oracle spells out the iters=2 case")
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) /
       |      (CASE WHEN list_aggregate(list_transform(embedding,
       |              x -> abs(CAST(x AS DOUBLE))), 'max') = 0 THEN 1.0
       |            ELSE list_aggregate(list_transform(embedding,
       |              x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 END)
       |      + 0.5) AS INTEGER)) AS qvec
       |  FROM embeddings),
       |sv AS (
       |  SELECT vec_id, j.sub,
       |         qvec[j.sub * (len(qvec) // $m) + 1 :
       |              j.sub * (len(qvec) // $m) + (len(qvec) // $m)] AS svec
       |  FROM q CROSS JOIN (SELECT unnest(range(0, $m)) AS sub) j),
       |c0 AS (
       |  SELECT sub, vec_id AS cid, svec AS cvec FROM sv
       |  QUALIFY row_number() OVER (PARTITION BY sub ORDER BY vec_id) <= $k),
       |a1 AS (
       |  SELECT vec_id, sub, cid, svec FROM (
       |    SELECT s.vec_id, s.sub, c.cid, s.svec,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
       |        list_dot_product(s.svec, s.svec) + list_dot_product(c.cvec, c.cvec)
       |          - 2 * list_dot_product(s.svec, c.cvec), c.cid) AS rn
       |    FROM sv s JOIN c0 c USING (sub)) WHERE rn = 1),
       |px AS (
       |  SELECT sub, cid, unnest(svec) AS code,
       |         unnest(range(1, len(svec) + 1)) AS pos
       |  FROM a1),
       |c1 AS (
       |  SELECT sub, cid, list(code ORDER BY pos) AS cvec FROM (
       |    SELECT sub, cid, pos,
       |           CAST(floor(CAST(sum(code) AS DOUBLE) / count(*) + 0.5) AS INTEGER) AS code
       |    FROM px GROUP BY sub, cid, pos)
       |  GROUP BY sub, cid),
       |codes AS (
       |  SELECT vec_id, sub, cid AS code FROM (
       |    SELECT s.vec_id, s.sub, c.cid,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
       |        list_dot_product(s.svec, s.svec) + list_dot_product(c.cvec, c.cvec)
       |          - 2 * list_dot_product(s.svec, c.cvec), c.cid) AS rn
       |    FROM sv s JOIN c1 c USING (sub)) WHERE rn = 1),
       |dt AS (
       |  SELECT s.vec_id AS query_id, s.sub, c.cid AS code,
       |         list_dot_product(s.svec, s.svec) + list_dot_product(c.cvec, c.cvec)
       |           - 2 * list_dot_product(s.svec, c.cvec) AS pd2
       |  FROM sv s JOIN c1 c USING (sub)
       |  WHERE s.vec_id < $queryMaxId),
       |scored AS (
       |  SELECT dt.query_id, codes.vec_id,
       |         CAST(sum(dt.pd2) AS BIGINT) AS adist2
       |  FROM codes JOIN dt USING (sub, code)
       |  WHERE codes.vec_id <> dt.query_id
       |  GROUP BY 1, 2)
       |SELECT query_id, vec_id, adist2, rank FROM (
       |  SELECT query_id, vec_id, adist2,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY adist2, vec_id) AS INT) AS rank
       |  FROM scored)
       |WHERE rank <= $topK""".stripMargin
  }
}
