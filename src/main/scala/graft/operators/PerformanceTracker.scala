package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tumbling-window numeric metrics (avg + exact p95) per category.
  *
  * Reference: services/processing/src/jobs/performance_tracker.py:12-45 —
  * null-filter the measured value, derive the category column, tumble,
  * and emit AVG + PERCENTILE(0.95) per (window, category).
  *
  * `percentile` is Catalyst's exact interpolating percentile (matches
  * DuckDB quantile_cont); `metricsApprox` swaps in `percentile_approx`
  * (GK sketch, mergeable, bounded memory) for the 100 TB path where
  * holding every value per group is not acceptable.
  *
  * The average is FIXED-POINT: each value quantizes to 1e-4 once
  * (deterministic per row), the sum is an exact BIGINT, and only the
  * final mean divides. A plain `round(avg(double), 4)` is NOT
  * hash-stable across engines — partial-aggregation order shifts the
  * last ulp, and at sf0.1 one group of ~8k landed exactly on a 4 dp
  * half boundary (57.09875) and rounded differently in Spark and
  * DuckDB. Inputs are metric-scaled (|value|·10⁴ « 2⁶³), so the
  * quantization is lossless for any value stated to 4 dp.
  */
object PerformanceTracker {

  /** Deterministic 4 dp mean: quantize → exact integer sum → divide. */
  def exactAvg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sum(round(c * 10000).cast("long")).cast("double") /
      (count(c) * 10000L).cast("double"), 4)

  /** The DuckDB twin of [[exactAvg]] over a `value` expression. */
  def exactAvgSql(expr: String = "value"): String =
    s"round(CAST(sum(CAST(round($expr * 10000) AS BIGINT)) AS DOUBLE) / (count($expr) * 10000.0), 4)"
  def metrics(events: DataFrame,
              timeCol: String = "ts",
              windowDuration: String = "300 seconds",
              valueCol: String = "value",
              categoryCol: Option[org.apache.spark.sql.Column] = None): DataFrame =
    events
      .filter(col(valueCol).isNotNull)
      .withColumn("category",
        categoryCol.getOrElse(Categorizer.categorize(col("event_type"))))
      .groupBy(window(col(timeCol), windowDuration), col("category"))
      .agg(
        exactAvg(col(valueCol)).as("avg_value"),
        round(percentile(col(valueCol), lit(0.95)), 4).as("p95_value"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        unix_millis(col("window.end")).as("window_end_ms"),
        col("category"),
        col("avg_value"),
        col("p95_value"))

  /** Scale-out variant: approximate percentile, bounded state per group. */
  def metricsApprox(events: DataFrame,
                    timeCol: String = "ts",
                    windowDuration: String = "300 seconds",
                    valueCol: String = "value",
                    accuracy: Int = 10000): DataFrame =
    events
      .filter(col(valueCol).isNotNull)
      .withColumn("category", Categorizer.categorize(col("event_type")))
      .groupBy(window(col(timeCol), windowDuration), col("category"))
      .agg(
        exactAvg(col(valueCol)).as("avg_value"),
        percentile_approx(col(valueCol), lit(0.95), lit(accuracy)).as("p95_value"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        unix_millis(col("window.end")).as("window_end_ms"),
        col("category"),
        col("avg_value"),
        col("p95_value"))
}
