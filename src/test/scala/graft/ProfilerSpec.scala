package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiler

class ProfilerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("profile counts nulls, distincts, min/max per column in one pass") {
    val d = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, Some("b"), None),
      (3L, None, Some(9.0)),
      (4L, Some("a"), Some(1.5))).toDF("id", "s", "v")
    val got = Profiler.profile(d, Seq("id", "s", "v"))
      .orderBy("column")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("v", 4L, 1L, 2L, "1.5", "9.0")))
  }

  test("profile plans a single scan of the input") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = Profiler.profileEvents(events)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"profiler must not rescan per column:\n$plan")
  }

  test("approxDistinct variant keeps the same shape with estimated counts") {
    val d = spark.range(1000).selectExpr("id", "id % 100 AS g")
    val got = Profiler.profile(d.toDF(), Seq("g"), approxDistinct = true)
      .as[(String, Long, Long, Long, String, String)].head()
    assert(got._1 == "g" && math.abs(got._4 - 100) <= 5)
  }
}
