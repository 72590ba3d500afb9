package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = 1714867200000L // 2024-05-05 00:00 UTC
  private def ev(user: Long, hour: Int, n: Int) =
    (0 until n).map(i =>
      (user, new Timestamp(base + hour * 3600000L + i * 1000L), "view"))

  test("activity profiles are dense 24-vectors of per-hour counts") {
    val events = (ev(1, 0, 3) ++ ev(1, 23, 2) ++ ev(2, 12, 4))
      .toDF("user_id", "ts", "event_type")
    val prof = TimeSeries.activityProfiles(events)
      .as[(Long, Array[Long], Long)].collect()
      .map { case (u, v, n) => u -> ((v.toSeq, n)) }.toMap
    assert(prof(1L)._1.length == 24)
    assert(prof(1L)._1.head == 3L && prof(1L)._1.last == 2L)
    assert(prof(1L)._1.sum == 5L && prof(1L)._2 == 5L)
    assert(prof(2L)._1(12) == 4L)
  }

  test("rhythm twins rank above rhythm opposites") {
    // user 0 (query): morning-heavy. user 10: same shape scaled — cosine
    // 1.0. user 11: night-heavy — cosine 0. Top-1 must be user 10.
    val events = (ev(0, 8, 4) ++ ev(0, 9, 2) ++
      ev(10, 8, 8) ++ ev(10, 9, 4) ++
      ev(11, 20, 5)).toDF("user_id", "ts", "event_type")
    val got = TimeSeries.similarActivity(events, queryMaxUser = 1, k = 2)
      .orderBy($"rank").select($"user_id", $"cos_sim")
      .as[(Long, Double)].collect().toSeq
    assert(got.head == (10L, 1.0), s"twin must rank first: $got")
    assert(got(1) == (11L, 0.0), s"opposite rhythm scores zero: $got")
  }
}
