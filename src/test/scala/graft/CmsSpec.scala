package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CmsFunctions._

class CmsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("point estimates are never under the true count; exact at low load") {
    val ev = Tables.events(spark, sf)
    val sk = ev.agg(cm_sketch($"event_type").as("sk"))
    val truth = ev.groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = sk.select(
      truth.keys.toSeq.map(t => cm_estimate($"sk", lit(t)).as(t)): _*).head()
    truth.zipWithIndex.foreach { case ((t, n), i) =>
      val e = est.getLong(i)
      assert(e >= n, s"underestimate for $t: $e < $n")
      // ~5 distinct types in 1024 columns: collisions are ~impossible
      assert(e == n, s"unexpected collision for $t: $e != $n")
    }
  }

  test("merging per-day sketches equals the whole-corpus sketch") {
    val ev = Tables.events(spark, sf)
      .withColumn("day", expr("unix_millis(ts) div 86400000"))
    val whole = ev.agg(cm_sketch($"user_id").as("sk")).head().getAs[Array[Byte]](0)
    val merged = ev.groupBy($"day").agg(cm_sketch($"user_id").as("sk"))
      .agg(cm_merge($"sk").as("sk")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("heavy-hitter query shape: estimate >= threshold filters correctly") {
    val ev = Tables.events(spark, sf)
    val sk = ev.agg(cm_sketch($"event_type").as("sk"))
    val types = ev.select($"event_type").distinct()
    val hot = types.crossJoin(broadcast(sk))
      .select($"event_type", cm_estimate($"sk", $"event_type").as("est"))
      .filter($"est" >= 1000)
      .collect().map(_.getString(0)).toSet
    val truth = ev.groupBy($"event_type").count()
      .filter($"count" >= 1000).collect().map(_.getString(0)).toSet
    assert(hot == truth)
  }

  test("SQL registration: cm_sketch/cm_estimate callable from spark.sql") {
    Tables.registerViews(spark, sf)
    val n = spark.sql(
      """SELECT cm_estimate(cm_sketch(event_type), 'purchase') FROM events""")
      .head().getLong(0)
    val want = spark.sql(
      "SELECT count(*) FROM events WHERE event_type = 'purchase'")
      .head().getLong(0)
    assert(n == want)
  }
}
