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

  test("cm_inner: join-size estimate exact at low load, >= always") {
    // a: {x:2, y:1}, b: {x:1, y:2, z:1} → |a ⋈ b| = 2·1 + 1·2 = 4
    val a = Seq("x", "x", "y").toDF("k")
    val b = Seq("x", "y", "y", "z").toDF("k")
    val est = graft.operators.JoinEstimate.estimateJoinSize(a, "k", b, "k")
      .as[Long].head()
    assert(est == 4L, s"est=$est") // 5 distinct keys in 1024 cols: no collision
    // self inner product = F2 (second frequency moment): 2² + 1² = 5
    val f2 = graft.operators.JoinEstimate.estimateJoinSize(a, "k", a, "k")
      .as[Long].head()
    assert(f2 == 5L, s"f2=$f2")
  }

  test("hardNegatives: same-label neighbors excluded, nearest wrong-label first") {
    val embs = Seq(
      (0L, Array(1f, 0f), 0),   // query
      (1L, Array(1f, 0.01f), 0), // same label: excluded however close
      (2L, Array(0.9f, 0.1f), 1),
      (3L, Array(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    val out = graft.ann.Similarity.hardNegatives(embs, queryMaxId = 1)
      .select("query_id", "neg_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3).toSeq
    assert(out == Seq((0L, 2L, 1), (0L, 3L, 2)), out.toString)
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
