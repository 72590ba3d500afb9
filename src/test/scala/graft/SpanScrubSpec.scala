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

  // focused on the r16 HOF rebuild internals (rebuildFromCuts): the
  // fold-based gaps-and-islands merge and complement reassembly must
  // handle every island topology the window form did.
  test("rebuildFromCuts HOF fold: overlap, adjacency, containment, tail") {
    val base = Seq(
      (0L, "0123456789ABCDEF"), // overlapping [2,6]+[5,9] → one island [2,9]
      (1L, "0123456789ABCDEF"), // adjacent [1,3]+[4,6] merge; [9,11] separate
      (2L, "0123456789ABCDEF"), // contained [3,12]+[5,7] → [3,12]
      (3L, "0123456789ABCDEF"), // cut to the exact end: tail piece empty
      (4L, "0123456789ABCDEF")  // no cuts: passthrough
    ).toDF("doc_id", "text")
    val cuts = Seq(
      (0L, 2L, 6L), (0L, 5L, 9L),
      (1L, 1L, 3L), (1L, 4L, 6L), (1L, 9L, 11L),
      (2L, 3L, 12L), (2L, 5L, 7L),
      (3L, 10L, 16L)
    ).toDF("doc_id", "s", "e")
    val out = SpanScrub.rebuildFromCuts(base, cuts)
      .as[(Long, Int, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 1, 8L, "09ABCDEF"),         // island [2,9] cut
      (1L, 2, 9L, "67BCDEF"),          // [1,6] + [9,11] cut
      (2L, 1, 10L, "01CDEF"),          // [3,12] cut (contains [5,7])
      (3L, 1, 7L, "012345678"),        // [10,16] cut, empty tail piece
      (4L, 0, 0L, "0123456789ABCDEF")  // untouched passthrough
    ), out.toString)
  }
}
