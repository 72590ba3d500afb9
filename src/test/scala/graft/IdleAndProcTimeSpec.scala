package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Pipelines

/** The two "no direct Spark knob" streaming rows from SURVEY §2.6,
  * implemented rather than documented away: W6 idle-source watermark
  * liveness via a heartbeat union, and P11/W5 processing-time mode via
  * the per-micro-batch `current_timestamp()`. */
class IdleAndProcTimeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Option[Double])
  case class Hb(ts: Timestamp)
  private val base = 1714867200000L

  test("heartbeat stream advances the watermark while the event source idles") {
    implicit val ctx = spark.sqlContext
    val events = MemoryStream[Ev]
    val beats = MemoryStream[Hb]
    val merged = Pipelines.withHeartbeats(events.toDF(), beats.toDF())
    val q = Pipelines.startMemorySink(
      Pipelines.idleSafeMetrics(merged, watermark = "5 seconds"), "idle_safe")
    try {
      events.addData(Ev(1L, new Timestamp(base + 1000), 7L, "view", Some(1.0)))
      q.processAllAvailable()
      // control: event source alone, watermark behind window end → no emission
      assert(spark.table("idle_safe").isEmpty,
        "window closed without any watermark advance — control broken")
      // event source now idles; ONLY the heartbeat side ticks forward
      beats.addData(Hb(new Timestamp(base + 120000)))
      q.processAllAvailable()
      beats.addData(Hb(new Timestamp(base + 180000)))
      q.processAllAvailable()
      val out = spark.table("idle_safe")
        .filter($"event_type" =!= Pipelines.heartbeatType) // sink-side sentinel drop
        .select($"window_start_ms", $"event_type", $"event_count")
        .as[(Long, String, Long)].collect().toSeq
      assert(out == Seq((base, "view", 1L)),
        s"idle event source stalled the watermark: $out")
    } finally q.stop()
  }

  test("proc-time mode windows on arrival time, not the event-time column") {
    implicit val ctx = spark.sqlContext
    val events = MemoryStream[Ev]
    val testStart = System.currentTimeMillis()
    val q = Pipelines.startMemorySink(
      Pipelines.procTimeMetrics(events.toDF(), window = "1 second"), "proc_mode")
    try {
      // event times are 2024-era; if windows derive from them, the
      // assertions below (window bounds ≥ test start) cannot hold
      events.addData(Ev(1L, new Timestamp(base), 7L, "view", Some(1.0)),
        Ev(2L, new Timestamp(base + 1), 8L, "view", Some(1.0)))
      q.processAllAvailable()
      Thread.sleep(1500) // cross at least one 1 s proc-window boundary
      events.addData(Ev(3L, new Timestamp(base + 2), 9L, "click", Some(1.0)))
      q.processAllAvailable()
      Thread.sleep(1500)
      events.addData(Ev(4L, new Timestamp(base + 3), 9L, "view", Some(1.0)))
      q.processAllAvailable()
      val rows = spark.table("proc_mode")
        .select($"window_start_ms", $"event_type", $"event_count")
        .as[(Long, String, Long)].collect().toSeq
      assert(rows.nonEmpty, "no proc-time window ever closed")
      assert(rows.forall(_._1 >= testStart - 1000),
        s"window bounds predate the test — windows derived from event time: $rows")
      // batch 1 (2 views, same batch → same proc window) must have closed
      assert(rows.exists { case (_, t, n) => t == "view" && n == 2L })
    } finally q.stop()
  }
}
