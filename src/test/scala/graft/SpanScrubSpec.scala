package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.SpanScrub

/** Surgical span dedup against hand-traced fixtures (k=5). */
class SpanScrubSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("repeated spans cut from later docs; first occurrence keeps") {
    val docs = Seq(
      (0L, "abcdefgh"),     // first occurrence of everything: untouched
      (1L, "xxabcdefghyy"), // embedded copy → [3,10] cut → "xxyy"
      (2L, "zzzzzzzzzz"),   // self-repeat: only the first gram survives
      (3L, "hello"),        // unique single gram: untouched
      (4L, "ab")            // shorter than k: untouched
    ).toDF("doc_id", "text")
    val out = SpanScrub.spanScrub(docs, k = 5)
      .as[(Long, Int, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 0, 0L, "abcdefgh"),
      (1L, 1, 8L, "xxyy"),
      (2L, 1, 9L, "z"),
      (3L, 0, 0L, "hello"),
      (4L, 0, 0L, "ab")), out.toString)
  }

  test("two disjoint repeated spans leave the novel middle intact") {
    val docs = Seq(
      (0L, "AAAAABBBBB"),
      (1L, "AAAAA-novel-BBBBB") // both 5-grams repeat; middle survives
    ).toDF("doc_id", "text")
    val out = SpanScrub.spanScrub(docs, k = 5)
      .as[(Long, Int, Long, String)].collect().sortBy(_._1).toSeq
    assert(out(1) == ((1L, 2, 10L, "-novel-")), out.toString)
  }
}
