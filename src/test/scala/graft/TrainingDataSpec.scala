package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TrainingData

/** Full pipeline composition: curated survivors → chunks → epoch
  * order, on the real sf0.001 corpus. */
class TrainingDataSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val out = TrainingData.prepare(
    Tables.documents(spark, "/root/testdata/sf0.001"),
    chunkTokens = 32, overlap = 4, nShards = 4).cache()

  test("pipeline output is non-empty, gated, and chunk-budgeted") {
    assert(out.count() > 0)
    val bad = out.filter(col("quality_pm") < 600 ||
      !col("lang_pred").isin("en", "de") || col("n_tokens") > 32)
    assert(bad.count() == 0)
  }

  test("every surviving doc's chunks are contiguous from index 0") {
    val byDoc = out.groupBy("doc_id")
      .agg(min("chunk_idx").as("mn"), max("chunk_idx").as("mx"),
        count(lit(1)).as("n"))
    assert(byDoc.filter(col("mn") =!= 0 || col("n") =!= col("mx") + 1)
      .count() == 0)
  }

  test("epoch manifests: same salt byte-identical, new salt permutes") {
    def manifestBytes(dir: String): Map[String, Seq[Byte]] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.getName.endsWith(".manifest")).map { f =>
        f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq
      }.toMap
    }
    val dirs = (1 to 3).map(_ =>
      java.nio.file.Files.createTempDirectory("graft_manifest").toString)
    graft.text.TrainingData.writeEpochManifest(out, dirs(0))
    graft.text.TrainingData.writeEpochManifest(out, dirs(1))
    val m0 = manifestBytes(dirs(0))
    val m1 = manifestBytes(dirs(1))
    assert(m0.nonEmpty && m0.keySet == (0 until 4).map(s => s"shard-$s.manifest").toSet)
    assert(m0 == m1, "same (corpus, salt) must serialize byte-identically")
    // a new salt is a new permutation: same chunk set, different order
    val epoch1 = TrainingData.prepare(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      chunkTokens = 32, overlap = 4, nShards = 4, salt = "epoch1")
    graft.text.TrainingData.writeEpochManifest(epoch1, dirs(2))
    val m2 = manifestBytes(dirs(2))
    assert(m0 != m2, "different salt must change the manifests")
    def chunkSet(m: Map[String, Seq[Byte]]): Set[(String, String)] =
      m.values.flatMap(b => new String(b.toArray, "UTF-8").split("\n"))
        .map(_.split(",")).map(a => (a(1), a(2))).toSet
    assert(chunkSet(m0) == chunkSet(m2), "same chunks across epochs")
  }

  test("epoch order: positions are a 1..n sequence per shard; salt permutes") {
    val perShard = out.groupBy("shard")
      .agg(min("position").as("mn"), max("position").as("mx"),
        count(lit(1)).as("n"))
    assert(perShard.filter(col("mn") =!= 1 || col("mx") =!= col("n"))
      .count() == 0)
    val epoch1 = TrainingData.prepare(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      chunkTokens = 32, overlap = 4, nShards = 4, salt = "epoch1")
    val o0 = out.select("doc_id", "chunk_idx", "shard", "position")
      .as[(Long, Long, Int, Long)].collect().toSet
    val o1 = epoch1.select("doc_id", "chunk_idx", "shard", "position")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(o0.map(t => (t._1, t._2)) == o1.map(t => (t._1, t._2)),
      "same chunks across epochs")
    assert(o0 != o1, "different salt must permute the order")
  }
}
