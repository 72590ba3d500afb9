package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventWire, ReferencePipelines}

/** The reference's e2e scenarios on the NATIVE wire schema: JSON bytes →
  * lenient decode → the three queries with UA device categorization and
  * composite session keys (test-scaled windows per .env.test). */
class ReferencePipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = 1714867200000L
  private val desktopUA = "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
  private val mobileUA = "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0) Mobile/15E148 Safari"

  private def eventJson(id: String, typ: String, user: String, session: String,
                        ua: String, loadTime: Long, offsetMs: Long): String =
    s"""{"event":{"id":"$id","type":"$typ"},"user":{"id":"$user"},
       |"device":{"user_agent":"$ua","screen_width":1920,"screen_height":1080},
       |"context":{"url":"https://example.com/p","session_id":"$session"},
       |"metrics":{"load_time":$loadTime,"interaction_time":100},
       |"timestamp":${base + offsetMs}}""".stripMargin.replace("\n", "")

  private def flushes = Seq(
    eventJson("f1", "page_view", "u-f", "s-f", desktopUA, 1, 3600000L),
    eventJson("f2", "page_view", "u-f", "s-f", desktopUA, 1, 7200000L))

  private var n = 0
  private def run(jsons: Seq[String], build: DataFrame => DataFrame): DataFrame = {
    n += 1; val name = s"ref_out_$n"
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[String]
    val q = build(EventWire.decode(ms.toDF().toDF("value")))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      ms.addData(jsons)
      q.processAllAvailable()
      flushes.foreach { f => ms.addData(Seq(f)); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  test("wire e2e: exact per-type counts and distinct users") {
    val got = run(Seq(
      eventJson("1", "page_view", "u-a", "s1", desktopUA, 100, 0),
      eventJson("2", "page_view", "u-b", "s2", mobileUA, 100, 1000),
      eventJson("3", "click", "u-a", "s1", desktopUA, 100, 2000),
      eventJson("4", "conversion", "u-c", "s3", desktopUA, 100, 3000),
      "garbage {not json",
      eventJson("5", "unknown_type", "u-d", "s4", desktopUA, 100, 4000)),
      df => ReferencePipelines.eventMetrics(df, "1 seconds", 5000L))
      .filter($"window_start_ms" === base)
      .select("event_type", "event_count", "user_count")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("page_view", 2L, 2L), ("click", 1L, 1L), ("conversion", 1L, 1L)))
  }

  test("wire e2e: composite-key session with UA device category") {
    val got = run(Seq(
      eventJson("1", "page_view", "u-a", "sess-1", mobileUA, 100, 0),
      eventJson("2", "page_view", "u-a", "sess-1", mobileUA, 100, 2000),
      eventJson("3", "click", "u-a", "sess-1", mobileUA, 100, 3000)), // clicks never extend sessions
      df => ReferencePipelines.sessionMetrics(df, "1 seconds", "5 seconds"))
      .filter($"user_id" === "u-a")
      .select("session_id", "page_count", "duration_ms", "category")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got == Seq(("sess-1", 2L, 7000L, "Mobile"))) // 2s span + 5s gap; click excluded
  }

  test("wire e2e: load-time percentiles per device category") {
    val jsons = Seq(100L, 200L, 300L, 400L, 500L).zipWithIndex.map { case (lt, i) =>
      eventJson(s"e$i", "page_view", "u-a", "s1", desktopUA, lt, i * 800L)
    } :+ eventJson("m", "page_view", "u-m", "s2", mobileUA, 999, 900L)
    val gotFull = run(jsons,
      df => ReferencePipelines.perfMetrics(df, "1 seconds", "5 seconds"))
      .filter($"window_start_ms" === base)
      .select("category", "avg_value", "p95_value")
      .as[(String, Double, Double)].collect()
      .map { case (c, a, p) => c -> ((a, p)) }.toMap
    assert(gotFull("Desktop") == ((300.0, 480.0)))
    assert(gotFull("Mobile") == ((999.0, 999.0)))
  }
}
