package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Graph-centrality operator: integer PageRank must hit the
  * hand-computed fixed point on a minimal graph, conserve (almost all)
  * rank mass on the real corpus, keep every node at least the base
  * term, and iterate as edges ⋈ broadcast(ranks) — never a cartesian. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("two-node symmetric graph reaches the computed fixed point") {
    val orders = Seq((1L, 10L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 7L), (1L, 7L)).toDF("l_orderkey", "l_suppkey")
    val scale = 1000000000000L
    val ranks = PageRank.supplierRank(orders, lineitem, iters = 3,
      scale = scale).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks.keySet == Set("c:10", "s:7"))
    // n=2, w=ow=2 both ways: contribution passes the full rank across,
    // so r_{t+1} = base + 85·r_t/100 for BOTH nodes symmetrically
    val r0 = scale / 2
    val base = r0 * 15 / 100
    val expected = (1 to 3).foldLeft(r0)((r, _) => base + 85 * r / 100)
    assert(ranks("c:10") == expected)
    assert(ranks("s:7") == expected)
  }

  test("real corpus: mass conserved within truncation slack, floor holds") {
    val ranks = PageRank.supplierRank(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf), iters = 5)
      .collect().map(_.getLong(1))
    val scale = 1000000000000L
    val n = ranks.length
    val total = ranks.sum
    // per-edge truncation leaks < 1 unit per (edge, iteration); the
    // damped series bounds total leakage far under n·iters·100 units
    assert(total <= scale)
    assert(total >= scale - 100L * n * 5,
      s"lost ${scale - total} units across $n nodes")
    val base = (scale / n) * 15 / 100
    assert(ranks.forall(_ >= base), "a node fell below the teleport floor")
  }

  test("iteration joins broadcast the rank table; no cartesian anywhere") {
    val df = PageRank.supplierRank(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf), iters = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("personalized rank concentrates mass at and around the seed") {
    val ranks = PageRank.personalizedRank(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val seedId = Tables.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.min($"o_custkey").cast("long"))
      .head.getLong(0)
    val seed = s"c:$seedId"
    // the seed holds the teleport mass: strictly the maximum rank
    assert(ranks(seed) == ranks.values.max)
    // suppliers the seed buys from outrank the median non-seed node
    val seedSuppliers = Tables.orders(spark, sf)
      .filter($"o_custkey" === seedId)
      .join(Tables.lineitem(spark, sf), $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey").distinct().collect().map(r => s"s:${r.getLong(0)}")
    val nonSeed = ranks.filterNot(_._1 == seed).values.toSeq.sorted
    val median = nonSeed(nonSeed.size / 2)
    assert(seedSuppliers.nonEmpty)
    assert(seedSuppliers.forall(s => ranks(s) >= median),
      "a direct neighbor of the seed fell below the median rank")
    // far mass decays: some node holds zero (teleport never reaches it
    // with full weight) or at least the min is far below the seed
    assert(nonSeed.head < ranks(seed) / 10)
  }

  test("size-gated fallback: shuffle path bit-equal, broadcast-free plan") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    // broadcastMaxNodes = 0 forces the large-graph path on small data
    val viaB = PageRank.supplierRank(orders, lineitem, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaS = PageRank.supplierRank(orders, lineitem, iters = 3,
      broadcastMaxNodes = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaB == viaS, "fallback path diverged from the broadcast path")
    val pprB = PageRank.personalizedRank(orders, lineitem, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pprS = PageRank.personalizedRank(orders, lineitem, iters = 3,
      broadcastMaxNodes = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pprB == pprS, "personalized fallback diverged")
    // plan gate: with Catalyst's own size-based broadcasting disabled
    // (what a billion-node rank table looks like to the planner), the
    // fallback plan must contain NO broadcast join anywhere
    val conf = spark.conf
    val saved = (conf.get("spark.sql.autoBroadcastJoinThreshold"),
      conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold"))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = PageRank.supplierRank(orders, lineitem, iters = 2,
        broadcastMaxNodes = 0L)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), "rank table still broadcast")
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      assert(!plan.contains("CartesianProduct"))
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", saved._1)
      saved._2.foreach(v =>
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v))
    }
  }

  test("higher weighted degree wins under symmetric structure") {
    // supplier 1 serves three customers, supplier 2 serves one; all
    // edge weights equal — more in-links must mean more rank
    val orders = Seq((1L, 10L), (2L, 11L), (3L, 12L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 1L), (2L, 1L), (3L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_suppkey")
    val ranks = PageRank.supplierRank(orders, lineitem, iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("s:1") > ranks("s:2"))
  }
}
