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
  * holding every value per group is not acceptable. Doubles are rounded
  * to 4 dp so oracle hash-comparison is stable across summation orders.
  */
object PerformanceTracker {
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
        round(avg(col(valueCol)), 4).as("avg_value"),
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
        round(avg(col(valueCol)), 4).as("avg_value"),
        percentile_approx(col(valueCol), lit(0.95), lit(accuracy)).as("p95_value"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        unix_millis(col("window.end")).as("window_end_ms"),
        col("category"),
        col("avg_value"),
        col("p95_value"))
}
