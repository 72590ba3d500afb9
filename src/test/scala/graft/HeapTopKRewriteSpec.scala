package graft

import org.scalatest.funsuite.AnyFunSuite

/** The heap-top-k optimizer rule: standard window SQL compiles to the
  * custom physical operator under the conf, result-identical. */
class HeapTopKRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sql =
    """SELECT o_custkey, o_orderkey FROM (
      |  SELECT o_custkey, o_orderkey,
      |         row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3""".stripMargin

  test("row_number()<=k window SQL becomes TopKPerKey under the conf") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    spark.conf.set("spark.graft.heapTopK", "false")
    val baseline = spark.sql(sql)
    val basePlan = baseline.queryExecution.executedPlan.toString
    assert(!basePlan.contains("TopKPerKey"))
    val expect = baseline.collect().map(_.toString).sorted
    try {
      spark.conf.set("spark.graft.heapTopK", "true")
      val heap = spark.sql(sql)
      val plan = heap.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKeyFinal") && plan.contains("TopKPerKeyPartial"),
        s"rewrite did not fire:\n$plan")
      assert(!plan.contains(" Window "), s"window survived the rewrite:\n$plan")
      assert(heap.collect().map(_.toString).sorted.sameElements(expect))
    } finally spark.conf.set("spark.graft.heapTopK", "false")
  }

  test("rn=1 (latest-per-key) and rank-used-downstream guard") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    try {
      spark.conf.set("spark.graft.heapTopK", "true")
      val latest = spark.sql(
        """SELECT o_custkey, o_orderkey FROM (
          |  SELECT o_custkey, o_orderkey, row_number() OVER (
          |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          |  FROM orders) WHERE rn = 1""".stripMargin)
      assert(latest.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"))
      // when rn is selected, the rewrite must NOT fire (rank is consumed)
      val keepsRank = spark.sql(
        """SELECT o_custkey, o_orderkey, rn FROM (
          |  SELECT o_custkey, o_orderkey, row_number() OVER (
          |    PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
          |  FROM orders) WHERE rn <= 3""".stripMargin)
      assert(!keepsRank.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    } finally spark.conf.set("spark.graft.heapTopK", "false")
  }
}
