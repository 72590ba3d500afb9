package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.UserActivity

/** transformWithState (Spark 4 arbitrary-state API): per-user running
  * counters, updated across micro-batches, under the RocksDB provider
  * (TWS requires it). */
class UserActivitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String)

  test("running per-user counters accumulate across micro-batches") {
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx = spark.sqlContext
    val base = 1714867200000L
    val ms = MemoryStream[Ev]
    val q = UserActivity.updates(ms.toDF())
      .writeStream.outputMode("update")
      .format("memory").queryName("activity").start()
    try {
      ms.addData(Seq(
        Ev(1, new Timestamp(base), 7, "view"),
        Ev(2, new Timestamp(base + 1000), 7, "purchase"),
        Ev(3, new Timestamp(base + 2000), 9, "view")))
      q.processAllAvailable()
      ms.addData(Seq(Ev(4, new Timestamp(base + 5000), 7, "view")))
      q.processAllAvailable()
      // latest state per user = the last Update row emitted
      val last = spark.table("activity")
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct($"n_events", $"n_purchases", $"last_ms"),
          $"n_events").as("s"))
        .select($"user_id", $"s.*")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(last(7L) == ((3L, 1L, base + 5000)))
      assert(last(9L) == ((1L, 0L, base + 2000)))
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
