package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Clusters

class ClustersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Every assertion runs ALL THREE paths: driver union-find (default
    * threshold), the distributed min-label loop (threshold 0), and the
    * alternating large-star/small-star variant. */
  private def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    val df = pairs.toDF("a_id", "b_id")
    val fast = Clusters.connectedComponents(df)
      .as[(Long, Long)].collect().toMap
    val dist = Clusters.connectedComponents(df, smallGraphThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist, "union-find and distributed paths disagree")
    val star = Clusters.connectedComponentsStar(df)
      .as[(Long, Long)].collect().toMap
    assert(fast == star, "union-find and star paths disagree")
    fast
  }

  test("transitive closure: A-B, B-C collapse to one cluster") {
    assert(cc((1L, 2L), (2L, 3L)) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long chain converges past one propagation round") {
    // path graph 9-8-7-...-1: diameter 8 forces multiple iterations
    val pairs = (1L to 8L).map(i => (i, i + 1))
    assert(cc(pairs: _*) == (1L to 9L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep separate min labels") {
    assert(cc((5L, 6L), (1L, 2L), (6L, 7L)) ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("random graphs: both paths agree (including min-root invariant)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val got = cc(pairs: _*)
      // every label is a member of its own cluster and is the min
      val byCluster = got.groupBy(_._2).view.mapValues(_.keys.min)
      byCluster.foreach { case (label, minMember) => assert(label == minMember) }
    }
  }

  test("star variant matches min-label on a diameter-24 path in O(log d) rounds") {
    // path 0-1-2-…-24: min-label propagation moves the 0 label one hop
    // per round, so it needs ≥ diameter (24) rounds to converge; the
    // alternating star rounds must land the same single cluster in
    // logarithmically few.
    val pairs = (0L until 24L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (labels, rounds) = Clusters.starRounds(pairs)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == (0L to 24L).map(_ -> 0L).toMap)
    assert(rounds < 12, s"star CC took $rounds rounds on diameter 24 — " +
      "no better than one-hop label propagation")
    info(s"star CC converged in $rounds rounds (min-label needs 24)")
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap

  test("refreshClusters: delta folds equal batch CC, including root-bridging and min-relabeling") {
    // batches: {1-2}, then {5-6}, then a BRIDGE {2-5} merging the two
    // existing components, then a new node SMALLER than every member
    // joining {0-6} — the min label must flow backwards through the
    // whole merged component
    val deltas = Seq(
      Seq((1L, 2L)), Seq((5L, 6L)), Seq((2L, 5L)), Seq((0L, 6L)))
    var labels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    deltas.foreach { d =>
      seen ++= d
      labels = Clusters.refreshClusters(labels, d.toDF("a_id", "b_id"))
      val batch = Clusters.connectedComponents(seen.toSeq.toDF("a_id", "b_id"))
      assert(labelsOf(labels) == labelsOf(batch),
        s"incremental diverged from batch after delta $d")
    }
    assert(labelsOf(labels) == (0L to 6L).filter(_ != 3L).filter(_ != 4L)
      .map(_ -> 0L).toMap)
    // replaying the last delta is a no-op (both endpoints project to
    // one root -> empty contracted graph)
    val replay = Clusters.refreshClusters(labels,
      Seq((0L, 6L)).toDF("a_id", "b_id"))
    assert(labelsOf(replay) == labelsOf(labels), "replayed delta moved labels")
  }

  test("refreshClusters: random delta streams equal batch CC at every step") {
    val rnd = new scala.util.Random(11)
    val all = Seq.fill(50)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    var labels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    all.grouped(10).zipWithIndex.foreach { case (delta, i) =>
      labels = Clusters.refreshClusters(labels, delta.toDF("a_id", "b_id"))
        .localCheckpoint()
      val sofar = all.take((i + 1) * 10)
      assert(labelsOf(labels) ==
        labelsOf(Clusters.connectedComponents(sofar.toDF("a_id", "b_id"))),
        s"diverged at delta ${i + 1}")
    }
  }

  test("incrClusters (shard-replayed pairs) equals batch dupClusters on the documents table") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val incr = labelsOf(Clusters.incrClusters(docs, maxId = 600L))
    val batch = labelsOf(Clusters.dupClusters(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < 600L)))
    assert(incr == batch, "incremental CC diverged from batch CC")
    assert(incr.nonEmpty, "gate needs at least one candidate pair")
  }

  test("ClusterRefresh stream: snapshots track batch CC; crash-replay is bit-equal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("clusterrefresh").toString
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val q = graft.streaming.ClusterRefresh.start(
      ms.toDF().toDF("a_id", "b_id"), s"$dir/pairs", s"$dir/labels",
      s"$dir/chk", compactEvery = Some(2L))
    val batches = Seq(Seq((10L, 20L)), Seq((30L, 40L)), Seq((20L, 30L)))
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      assert(q.exception.isEmpty, s"stream died: ${q.exception}")
      val streamed = labelsOf(
        graft.streaming.ClusterRefresh.latestLabels(spark, s"$dir/labels"))
      assert(streamed == labelsOf(Clusters.connectedComponents(
        batches.flatten.toDF("a_id", "b_id"))))
      // crash-replay of the LAST batch: reads the pre-batch snapshot,
      // rewrites its own partition with identical content
      graft.streaming.ClusterRefresh.refreshBatch(
        batches.last.toDF("a_id", "b_id"), 2L, s"$dir/pairs", s"$dir/labels")
      assert(labelsOf(graft.streaming.ClusterRefresh
        .latestLabels(spark, s"$dir/labels")) == streamed,
        "replay changed the cluster snapshot")
      // the pair-delta trail is the rebuild path: batch CC over the
      // schema-pinned pairState read reproduces the latest snapshot
      val trail = graft.streaming.ClusterRefresh
        .pairState(spark, s"$dir/pairs")
      assert(trail.columns.toSeq == Seq("a_id", "b_id", "batch_id"))
      assert(labelsOf(Clusters.connectedComponents(
        trail.drop("batch_id"))) == streamed,
        "rebuild from the pair trail diverged from the snapshot")
    } finally q.stop()
  }

  test("dupClusters groups near-identical docs end to end") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "completely different text with no overlap whatsoever here")).toDF("doc_id", "text")
    val got = Clusters.dupClusters(docs, minEstJaccard = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(got.get(1L).contains(1L) && got.get(2L).contains(1L))
    assert(!got.contains(3L)) // no candidate pair -> not in any cluster
  }
}
