package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Windows

class WindowsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("hopping: every event lands in exactly win/slide windows") {
    val d = Seq((1L, ts("2024-01-01T00:07:00Z"), "view"))
      .toDF("event_id", "ts", "event_type")
    val got = Windows.hoppingCounts(d).orderBy("window_start_ms")
      .as[(Long, Long, String, Long)].collect().toSeq
    val base = 19723L * 86400000L // 2024-01-01 epoch ms
    // 00:07 falls in [00:00,00:10) and [00:05,00:15)
    assert(got == Seq(
      (base, base + 600000L, "view", 1L),
      (base + 300000L, base + 900000L, "view", 1L)))
  }

  test("hopping: boundary event starts the next window, not the closed one") {
    // exactly at 00:10 -> windows [00:05,00:15) and [00:10,00:20)
    val d = Seq((1L, ts("2024-01-01T00:10:00Z"), "view"))
      .toDF("event_id", "ts", "event_type")
    val got = Windows.hoppingCounts(d).orderBy("window_start_ms")
      .as[(Long, Long, String, Long)].collect().toSeq
    val base = 19723L * 86400000L
    assert(got.map(_._1) == Seq(base + 300000L, base + 600000L))
  }

  test("anomalies: spike day flags against a flat history") {
    // ten days of 2 events, one day of 30: z = (30-4.545)/8.44 ~ 3.0
    val rows =
      (1 to 10).flatMap(d => Seq.fill(2)(("a", f"2024-01-$d%02dT01:00:00Z"))) ++
      Seq.fill(30)(("a", "2024-01-11T01:00:00Z"))
    val d = rows.zipWithIndex
      .map { case ((t, time), i) => (i.toLong, ts(time), t) }
      .toDF("event_id", "ts", "event_type")
    val got = Windows.dailyAnomalies(d).orderBy("day_num")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(got.size == 11)
    // the flat days share one (negative) z and never flag
    assert(got.init.forall(r => !r._5 && r._4 == got.head._4 && r._4 < 0))
    assert(got.last._5 && got.last._4 > 2.0, s"spike day should flag: ${got.last}")
  }

  test("anomalies: single-day types are excluded (no variance)") {
    val d = Seq((1L, ts("2024-01-01T01:00:00Z"), "solo"))
      .toDF("event_id", "ts", "event_type")
    assert(Windows.dailyAnomalies(d).count() == 0)
  }
}
