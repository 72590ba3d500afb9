package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling is the engine's join-side answer to hot keys (the
  * aggregation side is `Skew.saltedCountDistinct`): at 100 TB one
  * screaming-hot user/orderkey otherwise pins a single reducer. This
  * spec forces AQE's skew-join path on a synthetic 100×-skewed key with
  * test-scaled thresholds and asserts the skewed partition is actually
  * split (isSkew=true in the executed SMJ), proving the conf carries to
  * real plans — at production scale the same mechanism triggers on the
  * default 256 MB threshold. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits a skewed join partition (isSkew in executed plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // key 0 carries half of all rows; wide payload to clear byte
      // thresholds. No same-key operator downstream of the join —
      // AQE refuses to split a partition whose key distribution is
      // reused (e.g. by a groupBy on the join key).
      val left = spark.range(400000)
        .select((when($"id" % 2 === 0, 0L).otherwise($"id" % 1000)).as("k"),
          md5($"id".cast("string")).as("payload"))
      val right = spark.range(1000).select($"id".as("k"), ($"id" * 7).as("dim"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length($"payload")).as("bytes"))
      joined.collect() // materialize so AQE finalizes THIS QueryExecution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"AQE did not mark the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
