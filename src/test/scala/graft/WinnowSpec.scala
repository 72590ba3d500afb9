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

  test("sharedSpans surfaces the overlapping pair and only that pair") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, shared),
      (2L, "PREFIX PADDING BLOCK " + shared),
      (3L, "zzz completely different material qqq xyzzy unrelated words")
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.sharedSpans(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(pairs.head._3 >= 2L)
  }

  test("sharedSpans maxDf drops ubiquitous boilerplate spans") {
    val boiler = "subscribe to our newsletter for updates every single day ok"
    val docs = Seq(
      (1L, boiler), (2L, boiler), (3L, boiler), (4L, boiler)
    ).toDF("doc_id", "text")
    // every fp appears in 4 docs; cap at 3 → nothing survives the join
    assert(TextAnalysis.sharedSpans(docs, maxDf = 3).count() == 0L)
    // with the cap lifted all 6 pairs surface
    assert(TextAnalysis.sharedSpans(docs, maxDf = 10).count() == 6L)
  }

  test("native winnow expression matches the per-position reference bit-for-bit") {
    val docs = Seq(
      (1L, "a"),                                  // shorter than k: zero-padded single window
      (2L, "abcde"),                              // exactly k chars, one position
      (3L, "the quick brown fox jumps over the lazy dog 0123456789!?.,;"),
      (4L, ""),                                   // empty text
      (5L, "x" * 100)                             // uniform long run
    ).toDF("doc_id", "text")
    val fast = TextAnalysis.winnow(docs)
      .as[(Long, Long, Long)].collect().toSet
    val ref = TextAnalysis.winnowReference(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(fast == ref)
    assert(fast.nonEmpty)
  }
}
