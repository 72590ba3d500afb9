package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over the event stream: funnel conversion,
  * cohort retention, subtotal rollups, and per-user timelines — the
  * query shapes an event-analytics product layers over the reference's
  * raw event feed (reference stops at windowed counts:
  * `services/processing/src/jobs/event_metrics.py`; these are the
  * standard next queries over the same table).
  *
  * Scale notes (100 TB events):
  *  - funnel/cohort shuffle on user_id once per stage; stage outputs are
  *    one row per user (orders of magnitude below the event count), so
  *    every post-stage join is AQE-broadcastable.
  *  - rollup is a single pass: Spark plans ROLLUP as one Expand +
  *    partial/final HashAggregate — no per-grouping-set rescan.
  *  - timeline window functions sort within user partitions only (hash
  *    shuffle on user_id, in-partition sort; no global sort).
  */
object Behavior {

  private val dayNum = floor(unix_millis(col("ts")) / 86400000L).cast("long")

  // ---------------------------------------------------------------- funnel
  /** Ordered conversion funnel: stage k counts users whose earliest
    * step-k event falls strictly after their stage-(k−1) time. Returns
    * one row per stage with the surviving-user count. */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val first = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ts")).as("t"))
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col("event_type") === step)
        .select(col("user_id"), col("ts"))
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col("t"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
    }
    stages.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("int").as("step_idx"),
          lit(steps.take(i + 1).mkString(">")).as("step"),
          col("n_users"))
    }.reduce(_ unionAll _)
  }

  def funnelSql(steps: Seq[String] = Seq("view", "click", "purchase")): String = {
    val ctes = steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = '$step' GROUP BY 1)"
      else
        s"""s${i + 1} AS (
           |  SELECT e.user_id, min(e.ts) AS t FROM events e
           |  JOIN s$i p ON e.user_id = p.user_id AND e.ts > p.t
           |  WHERE e.event_type = '$step' GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val selects = steps.indices.map { i =>
      val label = steps.take(i + 1).mkString(">")
      s"SELECT CAST(${i + 1} AS INTEGER) AS step_idx, '$label' AS step, count(*) AS n_users FROM s${i + 1}"
    }.mkString("\nUNION ALL\n")
    s"WITH $ctes\n$selects"
  }

  // ------------------------------------------------------ cohort retention
  /** Weekly retention triangle: users bucketed by the epoch-week of
    * their first event; n_active = distinct users from cohort_week seen
    * again week_offset weeks later. Pure epoch-day integer arithmetic —
    * identical in every engine, no calendar functions. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), dayNum.as("day"))
    val cohort = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    days.join(cohort, Seq("user_id"))
      .select(col("user_id"),
        expr("cohort_day div 7").as("cohort_week"),
        expr("(day - cohort_day) div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  def cohortRetentionSql: String =
    """WITH days AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
      |cohort AS (
      |  SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1)
      |SELECT c.cohort_day // 7 AS cohort_week,
      |       (d.day - c.cohort_day) // 7 AS week_offset,
      |       count(DISTINCT d.user_id) AS n_active
      |FROM days d JOIN cohort c ON d.user_id = c.user_id
      |GROUP BY 1, 2""".stripMargin

  // ----------------------------------------------------------- ROLLUP
  /** Event counts + revenue with subtotals by (event_type, day): one
    * Expand + single aggregate pass, not a rescan per grouping set.
    * NULL group keys are coalesced to sentinels ('ALL' / −1) so the
    * result is NULL-free; gid disambiguates (1 = day subtotal,
    * 3 = grand total). */
  def typeDayRollup(events: DataFrame): DataFrame =
    events.select(col("event_type"), dayNum.as("day_num"), col("value"))
      .rollup("event_type", "day_num")
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        FixedPoint.sum4(col("value")).as("revenue"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day_num"), lit(-1L)).as("day_num"),
        col("gid"), col("n"), col("revenue"))

  def typeDayRollupSql: String =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |       coalesce(day_num, -1) AS day_num,
      |       CAST(GROUPING(event_type, day_num) AS INTEGER) AS gid,
      |       count(*) AS n,
      |       round(CAST(sum(CAST(round((value) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue
      |FROM (SELECT event_type, epoch_ms(ts) // 86400000 AS day_num, value
      |      FROM events)
      |GROUP BY ROLLUP(event_type, day_num)""".stripMargin

  // --------------------------------------------------------- user timeline
  /** Per-user event timeline: sequence number, gap since the previous
    * event (−1 for the first), and a running purchase count — lag /
    * row_number / cumulative-frame window functions with a total order
    * tiebreak (ts, event_id) so results are deterministic. */
  def userTimeline(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
      col("event_id"), col("user_id"), col("event_type"),
      row_number().over(w).as("seq"),
      coalesce(unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w)),
        lit(-1L)).as("gap_ms"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(cum)
        .as("purchases_so_far"))
  }

  def userTimelineSql: String =
    """SELECT event_id, user_id, event_type,
      |  row_number() OVER w AS seq,
      |  coalesce(epoch_ms(ts) - epoch_ms(lag(ts) OVER w), -1) AS gap_ms,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |       OVER (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS purchases_so_far
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
}
