package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("as-of picks the latest state at-or-before each event, per key") {
    val left = Seq(
      (1L, 1L, 100L), // before any state → null
      (2L, 1L, 250L), // after s@200 → "a"
      (3L, 1L, 300L), // exactly at s@300 → "b" (equality allowed)
      (4L, 1L, 999L), // far after → "b"
      (5L, 2L, 500L), // other key → its own state "x"
    ).toDF("event_id", "k", "tms").withColumn("t", timestamp_millis($"tms"))
    val right = Seq(
      (1L, 200L, "a"), (1L, 300L, "b"), (2L, 400L, "x")
    ).toDF("k", "stms", "state").withColumn("st", timestamp_millis($"stms"))
    val got = AsOfJoin.asOf(
      left.select("event_id", "k", "t"),
      right.select("k", "st", "state"),
      keyCols = Seq("k"), leftTime = "t", rightTime = "st",
      payload = Seq("state"))
      .select("event_id", "state").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(1L -> None, 2L -> Some("a"), 3L -> Some("b"),
      4L -> Some("b"), 5L -> Some("x")))
  }

  test("single shuffle: plan has exactly one exchange on the key") {
    val left = Seq((1L, 1L, 100L)).toDF("event_id", "k", "tms")
      .withColumn("t", timestamp_millis($"tms"))
    val right = Seq((1L, 50L, "a")).toDF("k", "stms", "state")
      .withColumn("st", timestamp_millis($"stms"))
    val df = AsOfJoin.asOf(left.select("event_id", "k", "t"),
      right.select("k", "st", "state"),
      Seq("k"), "t", "st", Seq("state"))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"no join node expected (union+window):\n$plan")
  }
}
