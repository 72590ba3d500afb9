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

  test("profile plans pruned per-column scans with no Expand") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val plan = Profiler.profileEvents(events)
      .queryExecution.executedPlan.toString
    // one stats pass + one scan per distinct-counted column, each
    // pruned to its single column — and no multi-distinct Expand
    // multiplying rows through the shuffle
    assert(!plan.contains("Expand"),
      s"multi-distinct Expand crept back in:\n$plan")
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size == 5, s"expected 1 stats + 4 distinct scans:\n$plan")
    assert(scans.exists(_.contains("ReadSchema: struct<event_id:bigint>")),
      s"distinct scans not pruned to one column:\n$plan")
  }

  test("approxDistinct variant keeps the same shape with estimated counts") {
    val d = spark.range(1000).selectExpr("id", "id % 100 AS g")
    val got = Profiler.profile(d.toDF(), Seq("g"), approxDistinct = true)
      .as[(String, Long, Long, Long, String, String)].head()
    assert(got._1 == "g" && math.abs(got._4 - 100) <= 5)
  }
}
