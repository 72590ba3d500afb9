package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("within-window pairs: boundary inclusive, both time orders, key-scoped") {
    val base = 1714867200000L
    val w = 60000L
    val df = Seq(
      (1L, 1L, base),               // pairs with 2 (exactly w later)
      (2L, 1L, base + w),           // and with 3 (w/2 later)
      (3L, 1L, base + w + w / 2),
      (4L, 1L, base + 10 * w),      // isolated
      (5L, 2L, base + w / 4),       // other key: no cross-key pairs
      (6L, 3L, base + w),           // id earlier in time than 7 — reversed order
      (7L, 3L, base),
    ).toDF("event_id", "user_id", "tms")
      .withColumn("ts", timestamp_millis($"tms"))
    val got = RangeJoin.withinTimePairs(df, windowMs = w)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 3L), (6L, 7L)))
  }
}
