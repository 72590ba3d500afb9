package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAggregator

/** The approx-mode optimizer rule needs a session built WITH the
  * extensions (optimizer rules can't be late-registered) — the shared
  * test session is built that way. */
class ApproxRewriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("approxDistinct=true rewrites COUNT DISTINCT to HLL++, plan-visible") {
    val df = Tables.events(spark, "/root/testdata/sf0.01")
    def userCounts = EventAggregator.aggregate(df)
      .agg(sum("user_count")).as[Long]

    spark.conf.set("spark.graft.approxDistinct", "false")
    val exact = userCounts.head()
    val exactPlan = EventAggregator.aggregate(df)
      .queryExecution.optimizedPlan.toString

    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val approx = userCounts.head()
      val approxPlan = EventAggregator.aggregate(df)
        .queryExecution.optimizedPlan.toString
      assert(approxPlan.contains("approx_count_distinct") ||
        approxPlan.contains("hyperloglog"), s"no HLL in plan:\n$approxPlan")
      assert(!exactPlan.contains("approx_count_distinct"))
      // within HLL++ default rsd (5%) of the exact total
      assert(math.abs(approx - exact) <= exact * 0.1,
        s"approx $approx vs exact $exact")
      assert(approx != 0)
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }
}
