package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Pipelines

/** Stream-stream interval join (SURVEY §2.3/§2.6 extension): inner join
  * of two watermarked projections of one event stream with an event-time
  * range condition — the state-bounded shape for enrichment joins. */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Option[Double])

  private val base = 1714867200000L
  private def ev(id: Long, offsetMs: Long, user: Long, typ: String,
                 value: Option[Double] = Some(1.0)) =
    Ev(id, new Timestamp(base + offsetMs), user, typ, value)

  test("purchases join views of the same user within the window") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.startMemorySink(
      Pipelines.purchaseAttribution(ms.toDF(), watermark = "1 seconds",
        windowSec = 60), "attrib_out")
    try {
      ms.addData(Seq(
        ev(1, 0, 7, "view"),            // in-window view
        ev(2, 30000, 7, "purchase", Some(9.99)),
        ev(3, 0, 8, "view"),            // other user: no purchase
        ev(4, 31000, 9, "purchase"),    // purchase with no prior view
        ev(5, 100000, 7, "view"),       // view AFTER the purchase: no match
        ev(6, 200000, 99, "view")))     // far-future flush
      q.processAllAvailable()
      ms.addData(ev(7, 400000, 99, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attrib_out")
      .select("purchase_id", "view_id", "user_id", "value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((2L, 1L, 7L, 9.99)))
  }

  test("view exactly windowSec before the purchase still matches; older does not") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.startMemorySink(
      Pipelines.purchaseAttribution(ms.toDF(), watermark = "1 seconds",
        windowSec = 60), "attrib_out2")
    try {
      ms.addData(Seq(
        ev(1, 0, 1, "view"),
        ev(2, 60000, 1, "purchase"),     // exactly 60s later: inclusive bound
        ev(3, 0, 2, "view"),
        ev(4, 60001, 2, "purchase")))    // 60.001s later: outside
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("attrib_out2")
      .select("purchase_id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }
}
