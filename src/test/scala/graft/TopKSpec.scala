package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopK

class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def windowEquivalent(k: Int) = {
    val df = testDf
    df.withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"v".desc, $"id".asc)))
      .filter($"rn" <= k).drop("rn")
  }

  private def testDf = {
    // 1000 rows, 7 keys, deterministic pseudo-random values, with
    // duplicate v values to exercise the tiebreak
    spark.range(1000).select(
      $"id",
      ($"id" % 7).cast("string").as("k"),
      (($"id" * 2654435761L) % 97).cast("double").as("v"))
  }

  test("matches the window-rank equivalent on a total order") {
    val got = TopK.perKey(testDf, Seq($"k"), Seq($"v".desc, $"id".asc), 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = windowEquivalent(5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(got.size == 35)
  }

  test("k larger than group size returns whole groups") {
    val tiny = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 9.0))
      .toDF("id", "k", "v")
    val got = TopK.perKey(tiny, Seq($"k"), Seq($"v".desc, $"id".asc), 10)
    assert(got.count() == 3)
  }

  test("plan: partial heap below a single exchange, final above") {
    val plan = TopK.perKey(testDf, Seq($"k"), Seq($"v".desc), 3)
      .queryExecution.executedPlan.toString
    val firstFinal = plan.indexOf("TopKPerKeyFinal")
    val firstPartial = plan.indexOf("TopKPerKeyPartial")
    assert(firstFinal >= 0 && firstPartial >= 0 && firstFinal < firstPartial,
      s"expected final above partial in:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange in:\n$plan")
  }

  test("null keys form their own group") {
    val df = Seq((1L, Some("a"), 1.0), (2L, None, 2.0), (3L, None, 3.0))
      .toDF("id", "k", "v")
    val got = TopK.perKey(df, Seq($"k"), Seq($"v".desc, $"id".asc), 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }
}
