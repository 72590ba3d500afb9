package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zkey round-trips: de-interleave recovers both dimensions") {
    val pairs = Gen.listOfN(1000, Gen.zip(Gen.choose(0, 65535), Gen.choose(0, 65535)))
      .apply(Gen.Parameters.default, Seed(42L)).get
    val bad = pairs.toDF("x", "y")
      .select($"x", $"y", Layout.zkey($"x", $"y").as("z"))
      .select($"x", $"y",
        Layout.unzkey($"z", 0).as("x2"), Layout.unzkey($"z", 1).as("y2"))
      .filter($"x" =!= $"x2" || $"y" =!= $"y2")
    assert(bad.isEmpty, bad.limit(3).collect().mkString(","))
  }

  test("zorderWrite files have tight bounding boxes in BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val n = 1 << 14
    // uniform grid over (x, y) in [0, 128)²
    val df = spark.range(n).select(
      ($"id" % 128).cast("int").as("x"), ($"id" / 128).cast("int").as("y"))
    Layout.zorderWrite(df, "x", "y", dir, bits = 7, files = 16)
    // per-file bounding boxes: read with input_file_name
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
      .collect()
    assert(boxes.length >= 8)
    // a z-ordered file of n/16 = 1024 cells covers a region ~32x32; a
    // linear sort by x alone would give dy = 127 for every file. Allow
    // generous slack for range-partition boundary files.
    val avgDy = boxes.map(_.getAs[Int]("dy").toDouble).sum / boxes.length
    val avgDx = boxes.map(_.getAs[Int]("dx").toDouble).sum / boxes.length
    assert(avgDx < 96 && avgDy < 96,
      s"files not clustered in both dims: avgDx=$avgDx avgDy=$avgDy")
  }
}
