package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Notifications, Pipelines}

/** Push channel (Redis pub/sub analog): every stored metric window is
  * published as a JSON message on the reference's channel name, a
  * subscriber receives messages push-style (including backlog — the
  * durable-log improvement), a replayed publish duplicates the raw log
  * exactly like Redis re-publishing, and the exactly-once consumer view
  * collapses the duplicates. */
class NotificationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Option[Double])
  private val base = 1714867200000L
  private def ev(id: Long, offsetMs: Long, user: Long) =
    Ev(id, new Timestamp(base + offsetMs), user, "view", Some(1.0))

  test("metric updates are published per window and received by a subscriber") {
    val dir = java.nio.file.Files.createTempDirectory("graft_notify")
    val log = s"$dir/log"
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val pub = Notifications.startPublisher(
      Pipelines.eventMetrics(ms.toDF(), watermark = "1 seconds",
        windowMs = 5000L),
      log, s"$dir/chk_pub", metricType = "event")
    try {
      (0 until 3).foreach { w =>
        ms.addData(Seq(ev(w * 10L, w * 5000L, w),
          ev(w * 10L + 1, w * 5000L + 1000, w + 100)))
        pub.processAllAvailable()
      }
      ms.addData(ev(990, 3600000L, 999)) // flush the watermark
      pub.processAllAvailable()
    } finally pub.stop()
    // push-style consumption, backlog included (a late subscriber in
    // Redis pub/sub would have lost these — the durable log does not)
    val sub = Notifications.subscribe(spark, log)
    assert(sub.isStreaming, "subscribe() must be a streaming source")
    val q = sub.writeStream.format("memory").queryName("notify_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val msgs = spark.table("notify_out").collect()
    assert(msgs.nonEmpty, "no messages received")
    assert(msgs.forall(_.getAs[String]("channel") ==
      Notifications.UpdatesChannel))
    assert(msgs.forall(_.getAs[String]("metric_type") == "event"))
    // one message per closed window, payload carries the stored fields
    val windows = msgs.map(_.getAs[Long]("window_start_ms")).toSet
    assert(windows.subsetOf(
      (0 until 720).map(w => base + w * 5000L).toSet))
    val payload = msgs.head.getAs[String]("payload")
    for (field <- Seq("window_start_ms", "event_type", "event_count"))
      assert(payload.contains("\"" + field + "\""),
        s"payload missing $field: $payload")
  }

  test("replayed publish duplicates the log; exactly-once view collapses it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_notify_replay")
    val log = s"$dir/log"
    val batch = Seq(
      (base, "view", 3L, 2L),
      (base + 5000L, "view", 1L, 1L))
      .toDF("window_start_ms", "event_type", "event_count", "unique_users")
    Notifications.publishBatch(batch, batchId = 7L, log, "event")
    val once = spark.read.parquet(log).count()
    // the crash-replay: same batch, same id, appended again — Redis
    // pub/sub re-publishes in exactly this situation
    Notifications.publishBatch(batch, batchId = 7L, log, "event")
    val raw = spark.read.parquet(log)
    assert(raw.count() == once * 2, "at-least-once log should duplicate")
    val view = Notifications.exactlyOnceView(raw)
    assert(view.count() == once, "exactly-once view kept duplicates")
    assert(view.select("window_start_ms").as[Long].collect().toSet ==
      Set(base, base + 5000L))
  }
}
