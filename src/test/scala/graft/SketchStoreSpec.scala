package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MetricsStore
import graft.streaming.Pipelines

/** End-to-end sketch-column story: a streaming pipeline persists
  * per-window HLL user sketches; cross-window distinct queries are then
  * sketch merges over the metric table — no rescan of raw events. The
  * assertions are EXACT equalities: the sketch hash is deterministic
  * (md5-replicable mode) and the user sets are far inside the
  * linear-counting regime, so the estimate is a pure function of the
  * input sets — it either always matches or never does. */
class SketchStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Option[Double])
  private val base = 1714867200000L
  private def ev(id: Long, offMs: Long, user: Long, typ: String,
                 value: Double = 1.0) =
    Ev(id, new Timestamp(base + offMs), user, typ, Some(value))

  test("streamed sketches answer cross-window distinct queries exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.startSketchSink(ms.toDF(), s"$dir/t", s"$dir/chk",
      watermark = "1 seconds", windowDur = "60 seconds")
    try {
      // window 0: users 1,2,3 view; window 1: users 3,4 view, user 5 buys
      ms.addData(ev(1, 1000, 1, "view", 10.0), ev(2, 2000, 2, "view", 20.0),
        ev(3, 3000, 3, "view", 30.0))
      q.processAllAvailable()
      ms.addData(ev(4, 61000, 3, "view", 40.0), ev(5, 62000, 4, "view", 50.0),
        ev(6, 63000, 5, "purchase", 60.0))
      q.processAllAvailable()
      ms.addData(ev(99, 600000, 9, "view")) // flush watermark
      q.processAllAvailable()
    } finally q.stop()
    val store = new MetricsStore(spark, dir)
    // union across both closed windows: users {1,2,3,4,5} — user 3
    // appears in both windows and must count once
    assert(store.distinctUsersAcross(s"$dir/t", base, base + 120000) == 5L)
    // single window
    assert(store.distinctUsersAcross(s"$dir/t", base, base + 60000) == 3L)
    // type-filtered across the full range
    assert(store.distinctUsersAcross(s"$dir/t", base, base + 120000,
      types = Seq("view")) == 4L)
    assert(store.distinctUsersAcross(s"$dir/t", base, base + 120000,
      types = Seq("purchase")) == 1L)
    // empty range
    assert(store.distinctUsersAcross(s"$dir/t", 0L, 1000L) == 0L)
    // the table really carries sketches, not raw users
    val cols = spark.read.parquet(s"$dir/t").columns.toSet
    assert(cols.contains("user_sketch") && !cols.contains("user_id"))

    // --- CMS frequency across windows: user 3 fired in both windows ---
    assert(store.userEventsAcross(s"$dir/t", base, base + 120000, 3L) == 2L)
    assert(store.userEventsAcross(s"$dir/t", base, base + 120000, 5L) == 1L)
    assert(store.userEventsAcross(s"$dir/t", base, base + 60000, 4L) == 0L)
    // --- KMV quantile across windows: values 10..50 for view ---
    val p50 = store.valueQuantileAcross(s"$dir/t", base, base + 120000, 0.5,
      types = Seq("view"))
    assert(p50 >= 20.0 && p50 <= 40.0, s"median of 10..50 was $p50")

    // --- daily compaction: same estimates from O(days) rows ---
    val preRows = spark.read.parquet(s"$dir/t").count()
    val preAll = store.distinctUsersAcross(s"$dir/t", base, base + 86400000)
    val preView = store.distinctUsersAcross(s"$dir/t", base, base + 86400000,
      types = Seq("view"))
    store.compactSketchesDaily(s"$dir/t", s"$dir/daily")
    val postRows = spark.read.parquet(s"$dir/daily").count()
    assert(postRows < preRows,
      s"compaction must reduce rows ($preRows -> $postRows)")
    assert(postRows == 2L, // one row per (day, type): view + purchase
      s"expected one supersketch per (day, type), got $postRows")
    // day-aligned reads are EXACT equalities: HLL merge is associative,
    // so the merged-then-estimated supersketch equals the estimate over
    // the raw per-window sketches
    assert(store.distinctUsersAcross(s"$dir/daily", base, base + 86400000)
      == preAll)
    assert(store.distinctUsersAcross(s"$dir/daily", base, base + 86400000,
      types = Seq("view")) == preView)
    assert(store.distinctUsersAcross(s"$dir/daily", base, base + 86400000,
      types = Seq("purchase")) == 1L)
    // frequency and quantile families survive compaction identically
    // (all three merges are associative)
    assert(store.userEventsAcross(s"$dir/daily", base, base + 86400000, 3L)
      == store.userEventsAcross(s"$dir/t", base, base + 86400000, 3L))
    assert(store.valueQuantileAcross(s"$dir/daily", base, base + 86400000, 0.5,
      types = Seq("view"))
      == store.valueQuantileAcross(s"$dir/t", base, base + 86400000, 0.5,
        types = Seq("view")))
  }

  test("stored theta sketches answer segment overlap without raw data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_theta").toString
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.startSketchSink(ms.toDF(), s"$dir/t", s"$dir/chk",
      watermark = "1 seconds", windowDur = "60 seconds")
    try {
      // w0: view {1,2,3}, purchase {3}; w1: view {4}, purchase {5}
      ms.addData(ev(1, 1000, 1, "view"), ev(2, 2000, 2, "view"),
        ev(3, 3000, 3, "view"), ev(4, 4000, 3, "purchase"))
      q.processAllAvailable()
      ms.addData(ev(5, 61000, 4, "view"), ev(6, 62000, 5, "purchase"))
      q.processAllAvailable()
      ms.addData(ev(99, 600000, 9, "view")) // flush watermark
      q.processAllAvailable()
    } finally q.stop()
    val store = new MetricsStore(spark, dir)
    // view {1,2,3,4} × purchase {3,5} — far below K, so the sketch
    // answers are EXACT: union 5, intersection {3} = 1, view-only 3
    assert(store.segmentOverlapAcross(s"$dir/t", base, base + 120000,
      "view", "purchase") == ((5L, 1L, 3L)))
    // single window: view {1,2,3} × purchase {3}
    assert(store.segmentOverlapAcross(s"$dir/t", base, base + 60000,
      "view", "purchase") == ((3L, 1L, 2L)))
    // missing segment: estimates degrade to (|A|, 0, |A|), no throw
    assert(store.segmentOverlapAcross(s"$dir/t", base, base + 120000,
      "view", "refund") == ((4L, 0L, 4L)))
    // theta merge is associative: day-aligned reads survive compaction
    store.compactSketchesDaily(s"$dir/t", s"$dir/daily")
    assert(store.segmentOverlapAcross(s"$dir/daily", base, base + 86400000,
      "view", "purchase")
      == store.segmentOverlapAcross(s"$dir/t", base, base + 86400000,
        "view", "purchase"))
  }
}
