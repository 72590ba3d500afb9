package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ann.{IvfKnn, Similarity}

class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("ivf returns at most k ranked neighbors per query, self excluded") {
    val got = IvfKnn.ivfKnn(Tables.embeddings(spark, sf), queryMaxId = 5, k = 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (q, v, _) => q != v })
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
  }

  test("ivf recall vs brute force is substantial at nprobe=4/16 cells") {
    val embs = Tables.embeddings(spark, sf)
    val exact = Similarity.knnBrute(embs, queryMaxId = 10, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = IvfKnn.ivfKnn(embs, queryMaxId = 10, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.2f")
    assert(recall >= 0.3, f"recall $recall%.2f too low")
  }

  test("centroid sampling is deterministic across invocations") {
    val embs = Tables.embeddings(spark, sf)
    val a = IvfKnn.centroids(embs, 8).map(_.toSeq)
    val b = IvfKnn.centroids(embs, 8).map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
