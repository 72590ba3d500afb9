package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd k-means over int8-quantized embeddings — the corpus-clustering
  * step of semantic curation pipelines (SemDeDup-style: cluster, then
  * prune/dedup within clusters; also the offline centroid training IVF
  * indexes want — see [[IvfKnn]]).
  *
  * Runs on the quantized codes so every piece of arithmetic is exact in
  * any engine: squared L2 distance decomposes into integer dot products
  * (|a−c|² = a·a + c·c − 2a·c, each ≤ 64·127² ≪ 2^53, computed by the
  * codegen'd [[graft.functions.DotProductI]]), and the centroid update
  * floor(sum/n + 0.5) divides two exact integers — bit-identical
  * everywhere, so the full clustering is DuckDB-oracle-checkable, which
  * float k-means (FP summation order) is not.
  *
  * Scale shape per iteration: centroids broadcast (k rows), the corpus
  * never shuffles for assignment; the update is one posexplode +
  * groupBy(cid, pos) — rows = corpus × dim, the standard mini-batch-
  * free Lloyd layout. Seeds are the k smallest vec_ids (deterministic;
  * swap for k-means|| offline at 100 TB, same loop).
  */
object KMeans {

  private[ann] def dist2(a: String, c: String) =
    graft.functions.VectorFunctions.dot_i(col(a), col(a)) +
      graft.functions.VectorFunctions.dot_i(col(c), col(c)) -
      lit(2L) * graft.functions.VectorFunctions.dot_i(col(a), col(c))

  /** (vec_id, cluster) after `iters` Lloyd rounds, k seeds. */
  def assign(embs: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val q = Quantize.quantize(embs).select(col("vec_id"), col("qvec"))
    var cents = q.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("qvec").as("cvec"))
    val rn = row_number().over(
      Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid")))
    def assignTo(c: DataFrame): DataFrame = q
      .crossJoin(broadcast(c))
      .withColumn("d2", dist2("qvec", "cvec"))
      .withColumn("rn", rn).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("qvec"))
    for (_ <- 1 until iters) {
      val assigned = assignTo(cents)
      cents = assigned
        .select(col("cid"), posexplode(col("qvec")).as(Seq("pos", "code")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("code")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cid"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"),
            floor(col("s").cast("double") / col("n") + 0.5).cast("int").as("code")))),
          e => e.getField("code")).as("cvec"))
    }
    assignTo(cents).select(col("vec_id"), col("cid").as("cluster"))
  }

  /** Assignment + per-cluster sizes (the curation view). */
  def clusterSizes(embs: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    assign(embs, k, iters).groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), min(col("vec_id")).as("min_vec"))

  /** Expected per-cluster cardinality [[autoK]] sizes the clustering
    * for: the pair join below does ~s²/2 work per cluster of size s, so
    * fixing expected s (not k!) is what keeps SemDeDup linear-ish as the
    * corpus grows — SemDeDup itself runs ~10⁵ clusters on web corpora
    * for exactly this reason. 512 ⇒ ≤ ~131k scored pairs per cluster. */
  val targetClusterSize = 512

  /** Cluster count for a corpus of `n` vectors at bounded expected
    * cluster cardinality. */
  def autoK(n: Long): Int =
    math.max(2, math.ceil(n.toDouble / targetClusterSize).toInt)

  /** SemDeDup (Abbas et al. 2023): cluster the corpus, then drop any
    * vector with a LOWER-id near-duplicate (cosine ≥ `threshold`) in the
    * SAME cluster — semantic dedup at a cost of cluster² instead of
    * corpus², because cross-cluster pairs are never scored. Keeps the
    * per-cluster minimum of each near-dup group (deterministic, same
    * keep-the-min convention as the other dedup families). Output: every
    * vector with its cluster and a `kept` flag, so downstream can either
    * filter survivors or audit the drops.
    *
    * `k <= 0` (the default) derives the cluster count from the corpus
    * size via [[autoK]] — a fixed k degrades the per-cluster pair join
    * toward corpus²/k as the corpus grows. The one eager `count()` in
    * the auto path is unavoidable: k is a structural plan parameter
    * (seed `limit(k)`), not a runtime value.
    *
    * k-means makes no size promise per cluster, so a skewed corpus can
    * still pile into one giant cluster; `maxClusterSize` is the hard
    * cap. Oversized clusters split into `ceil(size/cap)` deterministic
    * hash-salt buckets and only within-bucket pairs are scored — the
    * same class of approximation as the cluster boundary itself.
    * Clusters at or under the cap get a single bucket, so the cap is a
    * no-op (exact SemDeDup) until skew actually appears.
    *
    * Scale shape: assignment is the broadcast k-means pipeline; the
    * salt-bucket table is k tiny rows (broadcast); the pairwise pass
    * shuffles the corpus once, on (cluster, salt); norms are computed
    * once per row before the join. */
  /** The pair join's input: each vector with its cluster, salt bucket
    * and precomputed norm. Exposed for the skew spec — the per-
    * (cluster, salt) cardinality here IS the pair join's group size.
    * Hash salting keeps buckets NEAR `ceil(size/cap)`-way even, not
    * exactly (binomial spread); the documented bound is 2×cap. */
  private[graft] def saltedVectors(embs: DataFrame, assigned: DataFrame,
                                   maxClusterSize: Int): DataFrame = {
    val nSalts = assigned.groupBy(col("cluster"))
      .agg(ceil(count(lit(1)).cast("double") / maxClusterSize)
        .cast("int").as("n_salts"))
    embs.join(assigned, "vec_id")
      .join(broadcast(nSalts), "cluster")
      .select(col("cluster"),
        pmod(xxhash64(col("vec_id")), col("n_salts").cast("long"))
          .cast("int").as("salt"),
        col("vec_id"), col("embedding"),
        Similarity.norm(col("embedding")).as("nrm"))
  }

  def semanticDedup(embs: DataFrame, k: Int = 0, iters: Int = 2,
                    threshold: Double = 0.35,
                    maxClusterSize: Int = 4096): DataFrame = {
    val kk = if (k > 0) k else autoK(embs.count())
    // materialize the assignment once: it feeds the salt-count agg, the
    // pair join AND the final kept-flag join — three consumers that
    // would each replay the whole Lloyd pipeline. (vec_id, cluster)
    // rows are 12 bytes — trivial executor-local state at any scale.
    val assigned = assign(embs, kk, iters).localCheckpoint()
    val withC = saltedVectors(embs, assigned, maxClusterSize)
    val a = withC.select(col("cluster"), col("salt"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = withC.select(col("cluster"), col("salt"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val dropped = a.join(b, Seq("cluster", "salt"))
      .filter(col("a_id") < col("b_id"))
      .filter(round(Similarity.dot(col("a_emb"), col("b_emb")) /
        (col("a_nrm") * col("b_nrm")), 4) >= threshold)
      .select(col("b_id").as("vec_id")).distinct()
    assigned.join(dropped.withColumn("__drop", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        col("__drop").isNull.as("kept"))
  }

  def semanticDedupSql(k: Int = 8, iters: Int = 2,
                       threshold: Double = 0.35): String =
    s"""WITH asg AS (
       |${assignSql(k, iters)}
       |),
       |wc AS (
       |  SELECT a.cluster, e.vec_id, e.embedding,
       |         sqrt(list_dot_product(e.embedding, e.embedding)) AS nrm
       |  FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id),
       |dropped AS (
       |  SELECT DISTINCT y.vec_id
       |  FROM wc x JOIN wc y
       |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id
       |  WHERE round(list_dot_product(x.embedding, y.embedding) /
       |              (x.nrm * y.nrm), 4) >= $threshold)
       |SELECT a.vec_id, a.cluster, d.vec_id IS NULL AS kept
       |FROM asg a LEFT JOIN dropped d ON d.vec_id = a.vec_id""".stripMargin

  /** DuckDB oracle: identical integer pipeline. Parallel unnests zip
    * (code, position); list(... ORDER BY pos) rebuilds centroid
    * vectors; list_dot_product on small ints is exact in double. */
  def assignSql(k: Int = 8, iters: Int = 2): String = {
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
       |c0 AS (SELECT vec_id AS cid, qvec AS cvec FROM q ORDER BY vec_id LIMIT $k),
       |a1 AS (
       |  SELECT vec_id, cid, qvec FROM (
       |    SELECT q.vec_id, c.cid, q.qvec,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_dot_product(q.qvec, q.qvec) + list_dot_product(c.cvec, c.cvec)
       |          - 2 * list_dot_product(q.qvec, c.cvec), c.cid) AS rn
       |    FROM q CROSS JOIN c0 c) WHERE rn = 1),
       |px AS (
       |  SELECT cid, unnest(qvec) AS code,
       |         unnest(range(1, len(qvec) + 1)) AS pos
       |  FROM a1),
       |c1 AS (
       |  SELECT cid, list(code ORDER BY pos) AS cvec FROM (
       |    SELECT cid, pos,
       |           CAST(floor(CAST(sum(code) AS DOUBLE) / count(*) + 0.5) AS INTEGER) AS code
       |    FROM px GROUP BY cid, pos)
       |  GROUP BY cid)
       |SELECT vec_id, cid AS cluster FROM (
       |  SELECT q.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      list_dot_product(q.qvec, q.qvec) + list_dot_product(c.cvec, c.cvec)
       |        - 2 * list_dot_product(q.qvec, c.cvec), c.cid) AS rn
       |  FROM q CROSS JOIN c1 c) WHERE rn = 1""".stripMargin
  }

  def clusterSizesSql(k: Int = 8, iters: Int = 2): String =
    s"""SELECT cluster, count(*) AS n_members, min(vec_id) AS min_vec
       |FROM (
       |${assignSql(k, iters)}
       |) GROUP BY 1""".stripMargin
}
