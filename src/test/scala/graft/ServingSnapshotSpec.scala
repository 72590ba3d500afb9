package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Pipelines

class ServingSnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Option[Double])
  private val base = 1714867200000L
  private def ev(id: Long, offsetMs: Long, user: Long) =
    Ev(id, new Timestamp(base + offsetMs), user, "view", Some(1.0))

  test("snapshot holds only the newest N windows as batches arrive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap")
    val path = s"$dir/snapshot"
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.startServingSnapshot(
      Pipelines.eventMetrics(ms.toDF(), watermark = "1 seconds", windowMs = 5000L),
      path, s"$dir/chk", retain = 3,
      // pin the TTL clock to the (synthetic, 2024) event time so this
      // test exercises ONLY the newest-N rule; TTL has its own test
      now = () => base)
    try {
      // 6 windows of data, emitted over several batches
      (0 until 6).foreach { w =>
        ms.addData(Seq(ev(w * 10L, w * 5000L, w), ev(w * 10L + 1, w * 5000L + 1000, w + 100)))
        q.processAllAvailable()
      }
      ms.addData(ev(990, 3600000L, 999)) // flush watermark
      q.processAllAvailable()
      ms.addData(ev(991, 7200000L, 999))
      q.processAllAvailable()
    } finally q.stop()
    val snap = spark.read.parquet(path)
      .select("window_start_ms").as[Long].collect().toSeq
    assert(snap.size <= 3, s"retention violated: $snap")
    assert(snap.distinct.sorted.reverse == snap.distinct.sorted.reverse.take(3))
    // the newest retained window is the newest emitted (closed) one
    assert(snap.max >= base + 5 * 5000L - 5000L)
  }

  test("age-based TTL evicts old windows even under the retention cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_ttl")
    val path = s"$dir/snapshot"
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    // generous retain (no count pressure); TTL 12 s against an injected
    // clock fixed at base+20s → windows starting before base+8s expire
    val fakeNow = base + 20000L
    val q = Pipelines.startServingSnapshot(
      Pipelines.eventMetrics(ms.toDF(), watermark = "1 seconds", windowMs = 5000L),
      path, s"$dir/chk", retain = 100, ttlMs = 12000L, now = () => fakeNow)
    try {
      (0 until 6).foreach { w =>
        ms.addData(Seq(ev(w * 10L, w * 5000L, w), ev(w * 10L + 1, w * 5000L + 1000, w + 100)))
        q.processAllAvailable()
      }
      ms.addData(ev(990, 3600000L, 999)) // flush watermark
      q.processAllAvailable()
    } finally q.stop()
    val snap = spark.read.parquet(path)
      .select("window_start_ms").as[Long].collect().toSeq
    assert(snap.nonEmpty)
    assert(snap.forall(_ >= fakeNow - 12000L),
      s"TTL violated: expired windows survived: ${snap.map(_ - base)}")
    // windows 0 (base) and 1 (base+5s) were emitted, then must expire
    assert(!snap.contains(base) && !snap.contains(base + 5000L))
  }
}
