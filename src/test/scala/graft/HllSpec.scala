package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HllFunctions._
import graft.operators.EventAggregator

class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("estimate within rsd bounds of exact distinct") {
    val df = spark.range(100000).select((col("id") % 20000).as("v"))
    val est = df.agg(hll_estimate(hll_sketch($"v")).as("e")).as[Long].head()
    assert(math.abs(est - 20000) < 20000 * 0.05, s"estimate $est vs 20000")
  }

  test("sketches merge across groups to the union estimate") {
    // per-group sketches (like per-window rows), then re-aggregated
    val df = spark.range(50000)
      .select((col("id") % 10).as("g"), (col("id") % 7000).as("v"))
    val perGroup = df.groupBy("g").agg(hll_sketch($"v").as("sk"))
    val merged = perGroup.agg(hll_estimate(hll_merge($"sk")).as("e")).as[Long].head()
    assert(math.abs(merged - 7000) < 7000 * 0.05, s"merged $merged vs 7000")
    // merge order independence: single-pass sketch == merged group sketches
    val direct = df.agg(hll_estimate(hll_sketch($"v")).as("e")).as[Long].head()
    assert(merged == direct, s"merge not exact: $merged != $direct")
  }

  test("per-window user sketches reproduce exact distinct within tolerance") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
    val sketched = events
      .filter($"event_type".isin(EventAggregator.defaultAllowed: _*))
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(hll_sketch($"user_id").as("sk"))
    // roll up across windows AND types: global distinct users from sketches
    val est = sketched.agg(hll_estimate(hll_merge($"sk"))).as[Long].head()
    val exact = events
      .filter($"event_type".isin(EventAggregator.defaultAllowed: _*))
      .select(countDistinct($"user_id")).as[Long].head()
    assert(math.abs(est - exact) <= math.max(exact * 0.05, 3),
      s"sketch rollup $est vs exact $exact")
  }
}
