package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Theta, ThetaFunctions}
import graft.operators.SetSketch

/** Theta sketch set algebra: semilattice determinism, the
  * exact-below-K contract, full-sketch error bounds on a corpus 40×
  * the sketch size, and hash-mode safety. */
class ThetaSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import ThetaFunctions._

  private def bufOf(xs: Seq[Long]): Theta.Buf = {
    val b = Theta.empty(Theta.ModeMd5)
    xs.foreach(x => Theta.insert(b,
      Theta.draw(x, org.apache.spark.sql.types.LongType, replicable = true)))
    b
  }

  test("merge is a semilattice: split-vs-whole sketches are bit-identical") {
    val xs = (0L until 5000L).map(_ * 7919L)
    val whole = Theta.serialize(bufOf(xs))
    val (l, r) = xs.splitAt(1234)
    val merged = Theta.serialize(Theta.merge(bufOf(l), bufOf(r)))
    assert(java.util.Arrays.equals(whole, merged))
    // and the reverse merge order too
    val merged2 = Theta.serialize(Theta.merge(bufOf(r), bufOf(l)))
    assert(java.util.Arrays.equals(whole, merged2))
  }

  test("below K every estimate is exact") {
    val a = bufOf(0L until 100L)
    val b = bufOf(60L until 180L)
    assert(Theta.estimate(a) == 100L)
    assert(Theta.unionEstimate(a, b) == 180L)
    assert(Theta.intersectEstimate(a, b) == 40L)
    assert(Theta.aNotBEstimate(a, b) == 60L)
  }

  test("full sketches: estimates land within the 3-sigma KMV bound") {
    // 10 000 users in A, 10 000 in B, 5 000 shared → sketches are 40×
    // oversubscribed; rsd ≈ 1/sqrt(K-2) ≈ 6.3%, gate at 3σ of the
    // LARGER set size (intersection error scales with union size)
    val a = bufOf(0L until 10000L)
    val b = bufOf(5000L until 15000L)
    val sigma3 = (15000 * 3 / math.sqrt(Theta.K - 2)).toLong
    val u = Theta.unionEstimate(a, b)
    val i = Theta.intersectEstimate(a, b)
    val d = Theta.aNotBEstimate(a, b)
    info(s"union=$u (15000) inter=$i (5000) anotb=$d (5000) tol=$sigma3")
    assert(math.abs(u - 15000L) <= sigma3, s"union $u")
    assert(math.abs(i - 5000L) <= sigma3, s"inter $i")
    assert(math.abs(d - 5000L) <= sigma3, s"anotb $d")
  }

  test("hostile bytes are rejected with a diagnosable error") {
    for (bad <- Seq(Array.emptyByteArray, Array[Byte](1),
        Array[Byte](1, 0, 0, 0), // truncated count
        Array[Byte](9, 0, 0, 0, 0), // unknown mode
        Theta.serialize(bufOf(0L until 10L)).dropRight(1))) // short tail
      intercept[IllegalArgumentException] { Theta.deserialize(bad) }
    // a valid sketch round-trips
    val ok = Theta.serialize(bufOf(0L until 10L))
    assert(Theta.estimate(Theta.deserialize(ok)) == 10L)
  }

  test("mode mismatch is rejected, not silently merged") {
    val xx = Theta.empty(Theta.ModeXx)
    Theta.insert(xx, 42L)
    val md5 = Theta.empty(Theta.ModeMd5)
    Theta.insert(md5, 42L)
    intercept[IllegalArgumentException] { Theta.merge(xx, md5) }
  }

  test("aggregate pipeline: grouped sketch-merge equals direct sketch") {
    val df = spark.range(3000).select(
      (col("id") % 10).cast("int").as("g"),
      (col("id") % 700).as("v"))
    val direct = df.agg(theta_sketch_r(col("v")).as("sk"))
      .select(theta_estimate(col("sk"))).head.getLong(0)
    val rolled = df.groupBy(col("g")).agg(theta_sketch_r(col("v")).as("sk"))
      .agg(theta_merge(col("sk")).as("m"))
      .select(theta_estimate(col("m"))).head.getLong(0)
    assert(direct == rolled)
    assert(math.abs(direct - 700L) <= (700 * 3 / math.sqrt(Theta.K - 2)).toLong)
  }

  test("thetaSets: estimates at sf0.01 are exact (sketches not full)") {
    val out = SetSketch.thetaSets(Tables.events(spark, "/root/testdata/sf0.01"))
      .collect()
    assert(out.length == 10, "5 event types -> 10 unordered pairs")
    out.foreach { r =>
      assert(r.getAs[Long]("union_est") == r.getAs[Long]("exact_union"), r.toString)
      assert(r.getAs[Long]("inter_est") == r.getAs[Long]("exact_inter"), r.toString)
      assert(r.getAs[Long]("anotb_est") == r.getAs[Long]("exact_anotb"), r.toString)
    }
  }
}
