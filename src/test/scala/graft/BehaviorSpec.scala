package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Behavior

class BehaviorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  // (event_id, user_id, event_type, ts, value)
  private def ev(rows: (Long, Long, String, java.sql.Timestamp, Double)*) =
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")

  test("funnel: strictly-ordered stage progression") {
    val t0 = ts("2024-01-01T10:00:00Z"); val t1 = ts("2024-01-01T10:01:00Z")
    val t2 = ts("2024-01-01T10:02:00Z")
    val d = ev(
      // user 1 completes view -> click -> purchase in order
      (1L, 1L, "view", t0, 1.0), (2L, 1L, "click", t1, 1.0), (3L, 1L, "purchase", t2, 1.0),
      // user 2 clicks BEFORE viewing: click must not count (not after view)
      (4L, 2L, "click", t0, 1.0), (5L, 2L, "view", t1, 1.0),
      // user 3 views only
      (6L, 3L, "view", t0, 1.0),
      // user 4 purchases with no view: excluded entirely
      (7L, 4L, "purchase", t0, 1.0))
    val got = Behavior.funnel(d).orderBy("step_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "view", 3L),
      (2, "view>click", 1L),
      (3, "view>click>purchase", 1L)))
  }

  test("funnel: same-instant events do not advance a stage (strict >)") {
    val t0 = ts("2024-01-01T10:00:00Z")
    val d = ev((1L, 1L, "view", t0, 1.0), (2L, 1L, "click", t0, 1.0))
    val got = Behavior.funnel(d).orderBy("step_idx")
      .as[(Int, String, Long)].collect().toSeq
    assert(got.map(_._3) == Seq(1L, 0L, 0L))
  }

  test("cohort retention: offsets measured from each user's first day") {
    val d = ev(
      // user 1 first seen day 0 (epoch week 2817), active again 8 days later
      (1L, 1L, "view", ts("2024-01-01T00:00:00Z"), 1.0),
      (2L, 1L, "view", ts("2024-01-09T00:00:00Z"), 1.0),
      // user 2 first seen day 1, same epoch-week cohort, never returns
      (3L, 2L, "view", ts("2024-01-02T00:00:00Z"), 1.0))
    val got = Behavior.cohortRetention(d)
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    // 2024-01-01 = epoch day 19723 -> week 2817
    assert(got == Seq((2817L, 0L, 2L), (2817L, 1L, 1L)))
  }

  test("rollup: leaf, per-type subtotal, and grand total with sentinels") {
    val t0 = ts("2024-01-01T10:00:00Z")
    val d = ev(
      (1L, 1L, "view", t0, 1.5), (2L, 1L, "view", t0, 2.5),
      (3L, 2L, "purchase", t0, 10.0))
    val got = Behavior.typeDayRollup(d)
      .orderBy("gid", "event_type", "day_num")
      .as[(String, Long, Int, Long, Double)].collect().toSeq
    val day = 19723L
    assert(got == Seq(
      ("purchase", day, 0, 1L, 10.0),
      ("view", day, 0, 2L, 4.0),
      ("purchase", -1L, 1, 1L, 10.0),
      ("view", -1L, 1, 2L, 4.0),
      ("ALL", -1L, 3, 3L, 14.0)))
  }

  test("user timeline: seq, gaps, and running purchase count") {
    val d = ev(
      (1L, 1L, "view", ts("2024-01-01T10:00:00Z"), 1.0),
      (2L, 1L, "purchase", ts("2024-01-01T10:00:30Z"), 5.0),
      (3L, 1L, "view", ts("2024-01-01T10:01:30Z"), 1.0),
      (4L, 2L, "purchase", ts("2024-01-01T09:00:00Z"), 2.0))
    val got = Behavior.userTimeline(d).orderBy("user_id", "seq")
      .as[(Long, Long, String, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, "view", 1, -1L, 0L),
      (2L, 1L, "purchase", 2, 30000L, 1L),
      (3L, 1L, "view", 3, 60000L, 1L),
      (4L, 2L, "purchase", 1, -1L, 1L)))
  }

  test("user timeline: ts ties broken by event_id (deterministic)") {
    val t0 = ts("2024-01-01T10:00:00Z")
    val d = ev((2L, 1L, "view", t0, 1.0), (1L, 1L, "click", t0, 1.0))
    val got = Behavior.userTimeline(d).orderBy("seq")
      .as[(Long, Long, String, Int, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._4)) == Seq((1L, 1), (2L, 2)))
    assert(got(1)._5 == 0L) // same instant -> zero gap, not null
  }
}
