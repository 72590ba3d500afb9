package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed fact-fact join runs without any exchange") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.lineitem(spark, sf), "li_b", Seq("l_orderkey"))
    Bucketing.writeBucketed(Tables.orders(spark, sf), "ord_b", Seq("o_orderkey"))
    try {
      val df = Bucketing.orderRevenue(spark, "li_b", "ord_b")
      df.collect() // finalize AQE plan
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // correctness: same result as the unbucketed join
      val expected = Bucketing.orderRevenue(spark, "li_b", "ord_b").count()
      val unbucketed = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .select("o_orderkey").distinct().count()
      assert(expected == unbucketed)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
