package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic error-bound gate for the two approximate scale-path
  * variants (r5 verdict item 7) — the only queries the oracle could
  * previously check rows-only. Each variant joins against its exact
  * twin and counts groups violating the sketch's published guarantee;
  * the output is hash-checkable because the expected violation count
  * is ZERO — the DuckDB oracle computes the group counts from the
  * exact pipeline and pins n_violations at the literal the guarantee
  * promises, so an approx estimate drifting out of bounds breaks the
  * hash match and the scale path becomes oracle-visible.
  *
  *  - HLL++ distinct (`rsd`): |approx − exact| ≤ max(3·rsd·exact, 5)
  *    per group (3σ of the published relative standard deviation, with
  *    an absolute floor for the sparse-mode small-cardinality regime
  *    where HLL++ is exact-or-nearly-so).
  *  - GK percentile (`accuracy`, ε = 1/accuracy): the estimate is an
  *    actual data value whose RANK is within ε·n of the target, so per
  *    group count(value ≤ est) ≥ ⌊(0.95−ε)·n⌋ − 1 and
  *    count(value < est) ≤ ⌈(0.95+ε)·n⌉ + 1 (±1 absolute slack for
  *    boundary interpolation at tiny n). Rank counts are plain
  *    aggregates — the gate never collects per-group value lists, so
  *    it scales exactly like the aggregations it audits.
  */
object ApproxBounds {

  def bounds(events: DataFrame, rsd: Double = 0.05,
             accuracy: Int = 10000): DataFrame = {
    // --- HLL++ distinct vs exact, same groups by construction ---
    val exact = EventAggregator.aggregate(events)
    val approx = EventAggregator.aggregateApprox(events, rsd = rsd)
      .withColumnRenamed("event_count", "approx_events")
      .withColumnRenamed("user_count", "approx_users")
    val hll = exact
      .join(approx, Seq("window_start_ms", "window_end_ms", "event_type"))
      .select((abs(col("user_count") - col("approx_users")) >
          greatest(lit(3.0 * rsd) * col("user_count"), lit(5.0)) ||
        col("event_count") =!= col("approx_events")).cast("int").as("viol"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("viol")).cast("long").as("n_violations"))
      .select(lit("hll_distinct").as("variant"), col("n_groups"),
        col("n_violations"))

    // --- GK p95 rank guarantee vs the raw values ---
    val eps = 1.0 / accuracy
    val apx = PerformanceTracker.metricsApprox(events, accuracy = accuracy)
      .select(col("window_start_ms"), col("category"),
        col("p95_value").as("p95_apx"))
    val ev = events.filter(col("value").isNotNull)
      .withColumn("category", Categorizer.categorize(col("event_type")))
      .withColumn("window_start_ms",
        expr("(unix_millis(ts) div 300000) * 300000"))
    val gk = ev.join(apx, Seq("window_start_ms", "category"))
      .groupBy(col("window_start_ms"), col("category"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") <= col("p95_apx")).cast("long")).as("r_le"),
        sum((col("value") < col("p95_apx")).cast("long")).as("r_lt"))
      .select((!(col("r_le") >= floor(lit(0.95 - eps) * col("n")) - 1 &&
          col("r_lt") <= ceil(lit(0.95 + eps) * col("n")) + 1))
        .cast("int").as("viol"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("viol")).cast("long").as("n_violations"))
      .select(lit("gk_p95").as("variant"), col("n_groups"),
        col("n_violations"))

    hll.unionAll(gk)
  }

  /** The q_event_agg_approx artifact shape (r14, VERDICT r13 #6): the
    * approx scale path per group WITH its bound verdict folded into
    * the row, so the correctness artifact is self-describing instead
    * of carrying a perpetual `no_oracle` row whose gate lives one hop
    * away in q_approx_bounds. `event_count` is the exact aggregate
    * (oracle-checkable); `bounds_ok` applies the same per-group HLL
    * guarantee [[bounds]] uses — the DuckDB twin pins it at 1, so an
    * estimate drifting out of bounds breaks the hash match. The raw
    * estimate surface stays [[EventAggregator.aggregateApprox]]. */
  def eventAggApproxGated(events: DataFrame,
                          rsd: Double = 0.05): DataFrame = {
    val approx = EventAggregator.aggregateApprox(events, rsd = rsd)
      .select(col("window_start_ms"), col("window_end_ms"),
        col("event_type"), col("user_count").as("approx_users"))
    EventAggregator.aggregate(events)
      .join(approx, Seq("window_start_ms", "window_end_ms", "event_type"))
      .select(col("window_start_ms"), col("window_end_ms"),
        col("event_type"), col("event_count"),
        (abs(col("user_count") - col("approx_users")) <=
          greatest(lit(3.0 * rsd) * col("user_count"), lit(5.0)))
          .cast("int").as("bounds_ok"))
  }

  /** q_perf_approx's artifact shape (r14): exact-checkable avg + the
    * GK rank-guarantee verdict per group, oracle-pinned at 1. The raw
    * estimate surface stays [[PerformanceTracker.metricsApprox]]. */
  def perfApproxGated(events: DataFrame,
                      accuracy: Int = 10000): DataFrame = {
    val eps = 1.0 / accuracy
    val apx = PerformanceTracker.metricsApprox(events, accuracy = accuracy)
      .select(col("window_start_ms"), col("window_end_ms"),
        col("category"), col("avg_value"), col("p95_value").as("p95_apx"))
    val ev = events.filter(col("value").isNotNull)
      .withColumn("category", Categorizer.categorize(col("event_type")))
      .withColumn("window_start_ms",
        expr("(unix_millis(ts) div 300000) * 300000"))
    val ranks = ev
      .join(apx.select(col("window_start_ms"), col("category"),
        col("p95_apx")), Seq("window_start_ms", "category"))
      .groupBy(col("window_start_ms"), col("category"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") <= col("p95_apx")).cast("long")).as("r_le"),
        sum((col("value") < col("p95_apx")).cast("long")).as("r_lt"))
    apx.join(ranks, Seq("window_start_ms", "category"))
      .select(col("window_start_ms"), col("window_end_ms"),
        col("category"), col("avg_value"),
        (col("r_le") >= floor(lit(0.95 - eps) * col("n")) - 1 &&
          col("r_lt") <= ceil(lit(0.95 + eps) * col("n")) + 1)
          .cast("int").as("bounds_ok"))
  }

  /** DuckDB twin: group counts from the EXACT pipelines, n_violations
    * pinned at the guarantee's promise (0). */
  def boundsSql(allowed: Seq[String] = EventAggregator.defaultAllowed): String = {
    val allowedIn = allowed.map(s => s"'$s'").mkString("(", ",", ")")
    val catSql = Categorizer.categorizeSql("event_type")
    s"""SELECT 'gk_p95' AS variant, CAST(count(*) AS BIGINT) AS n_groups,
       |       CAST(0 AS BIGINT) AS n_violations FROM (
       |  SELECT 1 FROM events WHERE value IS NOT NULL
       |  GROUP BY (epoch_ms(ts) // 300000), $catSql)
       |UNION ALL
       |SELECT 'hll_distinct', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
       |FROM (
       |  SELECT 1 FROM events WHERE event_type IN $allowedIn
       |  GROUP BY (epoch_ms(ts) // 60000), event_type)""".stripMargin
  }
}
