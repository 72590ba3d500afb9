package graft
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
class DebugResSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  test("residual recall") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val brute = graft.ann.Similarity.knnBrute(embs, 50, 5)
      .select("query_id", "vec_id").localCheckpoint()
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val hits = df.select("query_id", "vec_id").intersect(brute).count()
      hits.toDouble / brute.count()
    }
    val plain = graft.ann.Pq.ivfPqKnn(embs, queryMaxId = 50)
    val res = graft.ann.Pq.ivfPqResKnn(embs, queryMaxId = 50)
    println(s"RECALL plain=${recall(plain)} residual=${recall(res)}")
  }
}
