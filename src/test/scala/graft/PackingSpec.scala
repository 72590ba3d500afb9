package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("packShards: concat-and-chunk semantics within a shard") {
    // one shard (nShards=1), budget 10: token counts 4,4,4 -> starts at
    // 0,4,8 -> chunks 0,0,0; fourth doc starts at 12 -> chunk 1
    val d = Seq(
      (0L, "a b c d"), (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val got = Packing.packShards(d, nShards = 1, tokenBudget = 10L)
      .orderBy("doc_id").select("doc_id", "shard", "n_tokens", "chunk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 4L, 0L), (1L, 0L, 4L, 0L),
      (2L, 0L, 4L, 0L), (3L, 0L, 4L, 1L)))
  }

  test("packShards: shards are independent streams") {
    val d = Seq((0L, "x y"), (1L, "x y"), (2L, "x y"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = Packing.packShards(d, nShards = 2, tokenBudget = 3L)
      .orderBy("doc_id").select("shard", "chunk")
      .as[(Long, Long)].collect().toSeq
    // shard 0: docs 0,2 (starts 0,2 -> chunks 0,0); shard 1: docs 1,3 same
    assert(got == Seq((0L, 0L), (1L, 0L), (0L, 0L), (1L, 0L)))
    val g2 = Packing.packShards(d, nShards = 2, tokenBudget = 2L)
      .orderBy("doc_id").select("chunk").as[Long].collect().toSeq
    assert(g2 == Seq(0L, 0L, 1L, 1L)) // second doc of each shard starts at 2
  }

  test("qualityBuckets: k buckets per lang, ordered by score") {
    val d = (1L to 8L).map { i =>
      val text = ("the quick fox. " * i.toInt).trim // quality rises with i
      (i, text, if (i <= 4) "en" else "es")
    }.toDF("doc_id", "text", "lang")
    val got = Packing.qualityBuckets(d, k = 2)
      .orderBy("lang", "doc_id")
      .as[(Long, String, Long, Int)].collect().toSeq
    // per lang: 4 docs -> buckets 1,1,2,2 in quality order
    assert(got.map(_._4) == Seq(1, 1, 2, 2, 1, 1, 2, 2))
    // scores non-decreasing with doc length within lang
    val en = got.filter(_._2 == "en").map(_._3)
    assert(en == en.sorted)
  }
}
