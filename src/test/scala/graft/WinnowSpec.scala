package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis

class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("winnowed fingerprints survive content shifts (same k-grams, moved)") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, shared),
      (2L, "PREFIX PADDING BLOCK " + shared), // same content, shifted
      (3L, "zzz completely different material qqq xyzzy unrelated words")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(docs)
      .select("doc_id", "fp").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val overlap12 = (fps(1L) & fps(2L)).size.toDouble / fps(1L).size
    val overlap13 = (fps(1L) & fps(3L)).size.toDouble / fps(1L).size
    assert(overlap12 > 0.5, s"shifted duplicate overlap too low: $overlap12")
    assert(overlap13 < 0.2, s"unrelated overlap too high: $overlap13")
  }
}
