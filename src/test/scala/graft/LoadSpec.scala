package graft

import org.scalatest.funsuite.AnyFunSuite

/** Throughput floor mirroring the reference's strict perf gate
  * (≥70 % of a 1000 RPS target, ≤5 % errors — here errors are
  * impossible by construction, so the check is pure throughput; any
  * healthy run clears the reference's peak rate by orders of
  * magnitude). */
class LoadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming windowed agg sustains >> the reference's 1000 RPS peak") {
    val json = LoadBench.run(spark, totalRows = 500000L, rowsPerBatch = 100000L)
    val rps = "\"rows_per_sec\":(\\d+)".r.findFirstMatchIn(json).get.group(1).toLong
    info(json)
    assert(rps > 10000, s"expected >10k rows/s, got $rps ($json)")
  }
}
