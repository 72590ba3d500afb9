package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling
import graft.text.Chunking

class ChunkMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chunking: stride/overlap cover every token, boundaries shared") {
    // 10 tokens, chunk 4, overlap 1 → stride 3: [1-4],[4-7],[7-10]
    val d = Seq((1L, (1 to 10).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.chunkDocs(d, chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got.map(_._3) == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(got.map(_._4) == Seq(4L, 4L, 4L))
  }

  test("chunking: short and empty docs are exactly one chunk") {
    val d = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val got = Chunking.chunkDocs(d, chunkTokens = 4, overlap = 1)
      .orderBy("doc_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, "a b", 2L), (2L, 0L, "", 0L)))
  }

  test("chunking: ragged tail chunk is short, not duplicated") {
    // 5 tokens, chunk 4, overlap 1 → [1-4],[4-5]
    val d = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = Chunking.chunkDocs(d, chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx").as[(Long, Long, String, Long)].collect().toSeq
    assert(got.map(_._3) == Seq("a b c d", "d e"))
  }

  test("mixture: output has exactly the target proportions, maximal size") {
    // inventory: A 100, B 20 → weights A 800000, B 200000:
    // T = min(100e6/8e5=125, 20e6/2e5=100) = 100 → keep A 80, B 20
    val docs = ((1 to 100).map(i => (i.toLong, "A")) ++
      (101 to 120).map(i => (i.toLong, "B"))).toDF("doc_id", "lang")
    val out = Sampling.mixtureSample(docs,
      weightsPpm = Seq("A" -> 800000L, "B" -> 200000L))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("A" -> 80L, "B" -> 20L))
  }

  test("mixture: undeclared strata drop; choice is seed-deterministic") {
    val docs = ((1 to 40).map(i => (i.toLong, "A")) ++
      (41 to 50).map(i => (i.toLong, "C"))).toDF("doc_id", "lang")
    val out1 = Sampling.mixtureSample(docs, weightsPpm = Seq("A" -> 1000000L))
    assert(out1.select("lang").distinct().as[String].collect().toSeq == Seq("A"))
    val ids1 = out1.select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.mixtureSample(docs, weightsPpm = Seq("A" -> 1000000L))
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    assert(ids1 == (1 to 40).map(_.toLong).toSet) // w=100% keeps all of A
  }
}
