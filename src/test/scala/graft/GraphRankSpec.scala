package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank
import graft.streaming.GraphRank

case class PairEv(c: Long, s: Long)

/** Streaming graph leg: rank refresh on edge-delta arrival must equal
  * the batch engine bit-for-bit (edge weights are a monoid, so summed
  * per-batch deltas ARE the cumulative aggregate), absorb a replayed
  * batch as a no-op, and survive delta compaction unchanged. */
class GraphRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ranksMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("streaming refresh bit-equals batch rank; replay and compaction are no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("graphrank").toString
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[PairEv]
    val q = GraphRank.start(ms.toDF(), s"$dir/state", s"$dir/ranks",
      s"$dir/chk", iters = 3)
    try {
      ms.addData(PairEv(1, 7), PairEv(1, 7), PairEv(2, 7), PairEv(3, 9))
      q.processAllAvailable()
      val r1 = ranksMap(spark.read.parquet(s"$dir/ranks"))
      val b1 = ranksMap(PageRank.rankFromPairs(
        Seq((1L, 7L, 2L), (2L, 7L, 1L), (3L, 9L, 1L)).toDF("c", "s", "w"),
        iters = 3))
      assert(r1 == b1, "after batch 0: streaming != batch")
      ms.addData(PairEv(2, 9), PairEv(1, 7))
      q.processAllAvailable()
      val r2 = ranksMap(spark.read.parquet(s"$dir/ranks"))
      val b2 = ranksMap(PageRank.rankFromPairs(
        Seq((1L, 7L, 3L), (2L, 7L, 1L), (3L, 9L, 1L), (2L, 9L, 1L))
          .toDF("c", "s", "w"), iters = 3))
      assert(r2 == b2, "after batch 1: streaming != batch")
      assert(r2 != r1, "second delta must move the ranks")
      // crash-replay: batch 1 re-lands its own partition with the same
      // content; the accumulated state — and thus the ranks — not double
      GraphRank.writeEdgeDelta(Seq((2L, 9L), (1L, 7L)).toDF("c", "s"),
        batchId = 1L, s"$dir/state")
      val replayed = ranksMap(GraphRank.refreshRanks(spark, s"$dir/state",
        iters = 3))
      assert(replayed == r2, "replayed batch changed the ranks")
      // the label leg rides the same edge store: refreshLabels over the
      // accumulated deltas == the batch operator on the cumulative pairs
      val seeds = Seq((1L, 10L), (2L, 20L)).toDF("c_custkey", "c_nationkey")
      val streamedLabels = GraphRank.refreshLabels(spark, s"$dir/state",
          graft.operators.LabelProp.nationSeeds(seeds, seedMax = 3))
        .select("node", "label", "round")
        .as[(String, Long, Long)].collect().toSet
      val batchLabels = graft.operators.LabelProp.labelsFromEdges(
          graft.operators.LabelProp.edgesFromPairs(
            Seq((1L, 7L, 3L), (2L, 7L, 1L), (3L, 9L, 1L), (2L, 9L, 1L))
              .toDF("c", "s", "w")),
          graft.operators.LabelProp.nationSeeds(seeds, seedMax = 3))
        .select("node", "label", "round")
        .as[(String, Long, Long)].collect().toSet
      assert(streamedLabels == batchLabels,
        s"streamed labels diverged: $streamedLabels vs $batchLabels")
      assert(streamedLabels.exists(_._1 == "s:7"), "labels must spread")
      // compaction folds the delta partitions without moving the answer
      GraphRank.compactEdgeState(spark, s"$dir/state")
      val compacted = ranksMap(GraphRank.refreshRanks(spark, s"$dir/state",
        iters = 3))
      assert(compacted == r2, "compaction changed the ranks")
      val parts = new java.io.File(s"$dir/state").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
      assert(parts == Set("batch_id=-1"), s"compaction left $parts")
    } finally q.stop()
  }
}
