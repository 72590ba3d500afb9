package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained-throughput harness — the analog of the reference's perf
  * suite (`tests/performance/load_test.py:36` runs 500 RPS × 30 s and
  * 1000 RPS × 60 s against the HTTP→Kafka→Flink path and asserts ≥70 %
  * of target and ≤5 % errors). Here the generator source feeds the
  * windowed-aggregation pipeline directly and we report achieved
  * rows/sec end-to-end through micro-batches.
  *
  * Prints one JSON line: {"rows":N,"seconds":S,"rows_per_sec":R,
  * "batches":B,"p50_batch_ms":…,"p95_batch_ms":…} — same latency
  * summary shape as the reference's metrics collector
  * (`tests/performance/core/metrics.py:21-59`).
  */
object LoadBench {
  import scala.jdk.CollectionConverters._

  def main(args: Array[String]): Unit = {
    val totalRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val rowsPerBatch = if (args.length > 1) args(1).toLong else 100000L
    val spark = Engine.sessionBuilder(Engine.envCores(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(run(spark, totalRows, rowsPerBatch))
    spark.stop()
  }

  /** Runs the pipeline to completion, returns the JSON summary line. */
  def run(spark: SparkSession, totalRows: Long, rowsPerBatch: Long): String = {
    val events = spark.readStream
      .format("graft.sources.EventGen")
      .option("totalRows", totalRows)
      .option("rowsPerBatch", rowsPerBatch)
      .load()
    // the reference's event_metrics shape: tumbling window × type
    val agg = events
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("event_count"),
        approx_count_distinct(col("user_id")).as("unique_users"))
    val q = agg.writeStream.outputMode("update")
      .format("noop").start()
    val t0 = System.nanoTime()
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    val batchMs = q.recentProgress.toSeq
      .map(p => p.durationMs.asScala.values.map(_.longValue).sum)
      .filter(_ > 0).sorted
    q.stop()
    def pct(p: Double): Long =
      if (batchMs.isEmpty) 0L
      else batchMs(math.min(batchMs.size - 1, (p * batchMs.size).toInt))
    f"""{"rows":$totalRows,"seconds":$secs%.2f,"rows_per_sec":${totalRows / secs}%.0f,"batches":${batchMs.size},"p50_batch_ms":${pct(0.5)},"p95_batch_ms":${pct(0.95)}}"""
  }
}
