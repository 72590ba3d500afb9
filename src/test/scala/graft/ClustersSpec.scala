package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Clusters

class ClustersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Every assertion runs BOTH paths: driver union-find (default
    * threshold) and the distributed label loop (threshold 0). */
  private def cc(pairs: (Long, Long)*): Map[Long, Long] = {
    val df = pairs.toDF("a_id", "b_id")
    val fast = Clusters.connectedComponents(df)
      .as[(Long, Long)].collect().toMap
    val dist = Clusters.connectedComponents(df, smallGraphThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == dist, "union-find and distributed paths disagree")
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
