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

  // r17 (ADVICE): scrubShard's one-probe '__in' left join fans out when
  // the gram store carries duplicate rows (the compaction/replay
  // window). Pin that BOTH outputs are value-identical anyway: store-hit
  // partitions are all-cut regardless of rn, duplicate cut ranges merge
  // into the same island, novel partitions never fan out, and exactly
  // one rn=1 row survives per gram — so a duplicated store costs
  // materialization bytes, never correctness.
  test("scrubShard outputs are identical under a duplicated gram store") {
    import org.apache.spark.sql.functions.col
    val store0 = Seq((10L, "abcdefgh")).toDF("doc_id", "text")
    val shard = Seq(
      (20L, "xxabcdefghyy"), // store-hit grams → cut
      (21L, "qqqqqqqqqq"),   // novel self-repeat → within-shard cuts
      (22L, "hello-world")   // novel unique
    ).toDF("doc_id", "text")
    val distinctStore = SpanScrub
      .scrubShard(store0, store0.limit(0).select(col("doc_id"))
        .select(col("doc_id").cast("long").as("gram")), k = 5)._2
      .localCheckpoint()
    val dupStore = distinctStore.unionByName(distinctStore)
      .unionByName(distinctStore)
    val (sA, nA) = SpanScrub.scrubShard(shard, distinctStore, k = 5)
    val (sB, nB) = SpanScrub.scrubShard(shard, dupStore, k = 5)
    assert(sA.exceptAll(sB).isEmpty && sB.exceptAll(sA).isEmpty)
    assert(nA.exceptAll(nB).isEmpty && nB.exceptAll(nA).isEmpty)
  }
}
