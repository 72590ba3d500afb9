package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.QSketch
import graft.functions.QSketchFunctions._

class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("quantile estimate within rank-error bounds of exact percentile") {
    // uniform 0..99999 -> p95 = 95000; k=1024 gives ~3% rank error
    val df = spark.range(100000).select(col("id").cast("double").as("v"), col("id").as("k"))
    val est = df.agg(q_sketch_quantile(q_sketch($"v", $"k"), lit(0.95)).as("q"))
      .as[Double].head()
    assert(math.abs(est - 95000) < 100000 * 0.04, s"p95 estimate $est vs 95000")
  }

  test("split-vs-whole sketches are bit-identical (semilattice merge)") {
    val df = spark.range(50000)
      .select((col("id") % 16).as("g"), col("id").cast("double").as("v"), col("id").as("k"))
    val whole = df.agg(q_sketch($"v", $"k").as("sk")).as[Array[Byte]].head()
    val merged = df.groupBy("g").agg(q_sketch($"v", $"k").as("sk"))
      .agg(q_sketch_merge($"sk").as("sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(whole, merged),
      "merged group sketches differ from the single-pass sketch")
  }

  test("repartitioned input produces the same sketch (order independence)") {
    val df = spark.range(20000).select(col("id").cast("double").as("v"), col("id").as("k"))
    val a = df.agg(q_sketch($"v", $"k").as("sk")).as[Array[Byte]].head()
    val b = df.repartition(13).agg(q_sketch($"v", $"k").as("sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(a, b))
  }

  test("replicable variant: split-vs-whole determinism + md5 hash construction") {
    val df = spark.range(50000)
      .select((col("id") % 16).as("g"), col("id").cast("double").as("v"), col("id").as("k"))
    val whole = df.agg(q_sketch_r($"v", $"k").as("sk")).as[Array[Byte]].head()
    val merged = df.groupBy("g").agg(q_sketch_r($"v", $"k").as("sk"))
      .agg(q_sketch_merge($"sk").as("sk")).as[Array[Byte]].head()
    assert(java.util.Arrays.equals(whole, merged),
      "replicable sketch is not merge-deterministic")
    // hash must be exactly the DuckDB-replicable construction:
    // bigint(first 15 hex of md5(key-as-string))
    val got = graft.functions.ReplicableHash.h60("42")
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("42".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == java.lang.Long.parseLong(md5hex.take(15), 16))
    // and h64 is the raw 64-bit pattern of the first 16 hex digits
    assert(graft.functions.ReplicableHash.h64("42") ==
      java.lang.Long.parseUnsignedLong(md5hex.take(16), 16))
  }

  test("merging sketches with different hash modes fails loudly, not silently") {
    val df = spark.range(100).select(col("id").cast("double").as("v"), col("id").as("k"))
    val xx = df.agg(q_sketch($"v", $"k").as("sk"))
    val md = df.agg(q_sketch_r($"v", $"k").as("sk"))
    val mixed = xx.unionAll(md).agg(q_sketch_merge($"sk").as("sk"))
    val e = intercept[Exception](mixed.collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("different hash modes"))),
      s"expected a hash-mode mismatch error, got: $e")
    // same-mode merges still work for both modes
    assert(xx.unionAll(xx).agg(q_sketch_merge($"sk")).collect().length == 1)
    assert(md.unionAll(md).agg(q_sketch_merge($"sk")).collect().length == 1)
  }

  test("small inputs are exact (sample holds every row)") {
    val df = Seq((1.0, 1L), (2.0, 2L), (3.0, 3L), (4.0, 4L), (5.0, 5L))
      .toDF("v", "k")
    val q = df.agg(q_sketch_quantile(q_sketch($"v", $"k"), lit(0.5)).as("m"))
      .as[Double].head()
    assert(q == 3.0)
  }

  test("per-window sketches roll up to the global percentile") {
    val events = Tables.events(spark, "/root/testdata/sf0.01")
      .filter($"value".isNotNull)
    val perWindow = events.groupBy(window($"ts", "1 day"))
      .agg(q_sketch($"value", $"event_id").as("sk"))
    val est = perWindow.agg(q_sketch_quantile(q_sketch_merge($"sk"), lit(0.95)))
      .as[Double].head()
    val exact = events.agg(expr("percentile(value, 0.95)")).as[Double].head()
    // rank error eps ~ 1.5/sqrt(k): value at rank p +/- eps
    val lo = events.agg(expr("percentile(value, 0.90)")).as[Double].head()
    val hi = events.agg(expr("percentile(value, 1.0)")).as[Double].head()
    assert(est >= lo && est <= hi, s"p95 rollup $est outside [$lo, $hi] (exact $exact)")
  }

  test("SQL registration: q_sketch functions usable from spark.sql") {
    graft.functions.GraftExtensions.registerAll(spark)
    spark.range(1000).select(col("id").cast("double").as("v"), col("id").as("k"))
      .createOrReplaceTempView("qs_in")
    val q = spark.sql(
      "SELECT q_sketch_quantile(q_sketch(v, k), 0.5) AS m FROM qs_in")
      .as[Double].head()
    assert(math.abs(q - 500.0) < 100)
  }

  test("buffer invariants: dup rejection, eviction, tie handling") {
    val b = QSketch.empty()
    QSketch.insert(b, 10L, 1.0)
    QSketch.insert(b, 10L, 1.0) // exact dup ignored
    assert(b.n == 1)
    QSketch.insert(b, 5L, 2.0)
    assert(b.n == 2 && b.hashes(0) == 5L)
    // fill to K with ascending hashes, then a smaller one evicts the max
    (100L until (100L + QSketch.K)).foreach(h => QSketch.insert(b, h, h.toDouble))
    assert(b.n == QSketch.K)
    val maxBefore = b.hashes(b.n - 1)
    QSketch.insert(b, 1L, 9.0)
    assert(b.hashes(b.n - 1) < maxBefore && b.hashes(0) == 1L)
    // beyond-threshold insert is a no-op
    QSketch.insert(b, Long.MaxValue, 0.0)
    assert(b.n == QSketch.K)
  }
}
