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
