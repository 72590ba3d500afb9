package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving-layer read models.
  *
  * Reference: the Redis cache service — per-window pivoted hashes
  * (services/cache/src/infrastructure/kafka/message_parser.py:11-48),
  * newest-N window listing and latest-window overview
  * (services/cache/src/infrastructure/redis/repository.py:80-139).
  *
  * Re-expressed relationally: the pivot is a groupBy().pivot() with the
  * type universe declared up front (no second pass to discover values —
  * at 100 TB a dynamic pivot would be an extra full scan), and the
  * "latest" lookups are ORDER BY window DESC LIMIT n with a total-order
  * tiebreak so results are deterministic under parallel execution.
  */
object Serving {

  /** Wide per-window row: `{type}_count` / `{type}_users` columns —
    * the relational equivalent of the cache's per-window hash fields.
    * Missing (window, type) combinations surface as 0, matching the
    * hash's absent-field-means-zero read semantics. */
  def pivotEventCounts(eventAgg: DataFrame,
                       types: Seq[String] = EventAggregator.defaultAllowed): DataFrame = {
    val pivoted = eventAgg
      .groupBy(col("window_start_ms"))
      .pivot("event_type", types)
      .agg(sum("event_count").as("count"), sum("user_count").as("users"))
    val filled = types.flatMap(t => Seq(s"${t}_count", s"${t}_users"))
      .foldLeft(pivoted) { (df, c) =>
        df.withColumn(c, coalesce(col(c), lit(0L)))
      }
    filled.select(col("window_start_ms") +: types.flatMap(t =>
      Seq(col(s"${t}_count"), col(s"${t}_users"))): _*)
  }

  /** Newest-N windows (repository.py:129-139 zrevrange semantics); fully
    * deterministic via (window desc, event_type) total order. */
  def latestWindows(eventAgg: DataFrame, n: Int = 20): DataFrame =
    eventAgg.orderBy(col("window_start_ms").desc, col("event_type")).limit(n)

  /** Latest event window + latest performance window merged into one row
    * (cache_service.py:31-38 get_overview). Two single-row aggregates
    * cross-joined — both sides are 1 row, so the join is a broadcast
    * nested loop over singletons: no shuffle. */
  def overview(eventAgg: DataFrame, perf: DataFrame,
               types: Seq[String] = EventAggregator.defaultAllowed,
               categories: Seq[String] = Categorizer.defaultRules.map(_._2)): DataFrame = {
    val latestEventWin = eventAgg.agg(max("window_start_ms").as("event_window_ms"))
    // single-agg pivot names columns by pivot value alone — rename to {t}_count
    val eventRow = eventAgg
      .join(latestEventWin, col("window_start_ms") === col("event_window_ms"))
      .groupBy(col("event_window_ms"))
      .pivot("event_type", types)
      .agg(sum("event_count"))
    val eventFilled = types.foldLeft(eventRow) { (df, t) =>
      df.withColumnRenamed(t, s"${t}_count")
        .withColumn(s"${t}_count", coalesce(col(s"${t}_count"), lit(0L)))
    }
    val latestPerfWin = perf.agg(max("window_start_ms").as("perf_window_ms"))
    val perfRow = perf
      .join(latestPerfWin, col("window_start_ms") === col("perf_window_ms"))
      .groupBy(col("perf_window_ms"))
      .pivot("category", categories)
      .agg(sum("avg_value"))
    val perfFilled = categories.foldLeft(perfRow) { (df, c) =>
      df.withColumnRenamed(c, s"${c}_avg")
        .withColumn(s"${c}_avg", round(coalesce(col(s"${c}_avg"), lit(0.0)), 4))
    }
    eventFilled.crossJoin(perfFilled)
  }
}
