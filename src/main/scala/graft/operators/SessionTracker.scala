package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based session windows.
  *
  * Reference: services/processing/src/jobs/session_tracker.py:13-59 —
  * filter to page views BEFORE windowing (other event types never extend
  * a session), session window with a fixed inactivity gap keyed by the
  * session/user identity, emit start/end/duration/page_count plus
  * MAX(category) (deterministic arbitrary pick).
  *
  * Spark's built-in `session_window` has the same close semantics as
  * Flink's SESSION window: window end = last event time + gap, and an
  * event landing exactly `gap` after the previous one starts a NEW
  * session (intervals are half-open, merge requires strict overlap).
  * Duration is therefore end-start of the gap-extended window, and a
  * single-event session has duration == gap.
  *
  * Scale notes: session_window is one shuffle on the session key followed
  * by in-partition sort-merge of candidate windows — no driver-side state;
  * key cardinality (users) spreads across executors, and skewed keys are
  * handled by AQE.
  */
object SessionTracker {
  def sessions(events: DataFrame,
               timeCol: String = "ts",
               gap: String = "1800 seconds",
               pageEventType: String = "view",
               keyCols: Seq[String] = Seq("user_id"),
               categoryCol: org.apache.spark.sql.Column =
                 Categorizer.categorize(col("event_type"))): DataFrame = {
    events
      .filter(col("event_type") === pageEventType)
      .groupBy(session_window(col(timeCol), gap) +: keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("page_count"),
        max(categoryCol).as("category"))
      .select(keyCols.map(col) ++ Seq(
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        (unix_millis(col("session_window.end")) -
          unix_millis(col("session_window.start"))).as("duration_ms"),
        col("page_count"),
        col("category")): _*)
  }

  /** Dynamic-gap sessions: the inactivity gap is a PER-EVENT expression
    * — here purchases hold the session open `purchaseGapSec` while
    * everything else gets `baseGapSec` (the "checkout takes longer than
    * browsing" policy). Spark's `session_window` accepts a gap Column;
    * each event contributes the interval [ts, ts+gap(event)) and
    * overlapping intervals merge, so the session end is the running max
    * of per-event deadlines. Same one-shuffle shape as the fixed gap. */
  def dynamicSessions(events: DataFrame,
                      baseGapSec: Int = 1800,
                      purchaseGapSec: Int = 3600): DataFrame = {
    // string durations: session_window's dynamic gap wants a
    // CalendarIntervalType (day-time INTERVAL literals are rejected)
    val gap = when(col("event_type") === "purchase",
      lit(s"$purchaseGapSec seconds")).otherwise(lit(s"$baseGapSec seconds"))
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("event_type") === "purchase").cast("long")).as("n_purchases"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("n_events"), col("n_purchases"))
  }

  /** Oracle: interval-merge as an island construction — a new session
    * starts when an event's ts reaches the running max of previous
    * deadlines (ts + gap); session end = max deadline in the island. */
  def dynamicSessionsSql(baseGapSec: Int = 1800,
                         purchaseGapSec: Int = 3600): String =
    s"""WITH ev AS (
       |  SELECT user_id, epoch_ms(ts) AS tms, event_type,
       |         CASE WHEN event_type = 'purchase'
       |              THEN ${purchaseGapSec * 1000L} ELSE ${baseGapSec * 1000L}
       |         END AS gap_ms
       |  FROM events),
       |marked AS (
       |  SELECT *,
       |    CASE WHEN max(tms + gap_ms) OVER (PARTITION BY user_id ORDER BY tms
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) <= tms
       |         THEN 1 ELSE 0 END AS brk
       |  FROM ev),
       |islands AS (
       |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tms
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
       |  FROM marked)
       |SELECT user_id, min(tms) AS start_ms, max(tms + gap_ms) AS end_ms,
       |       count(*) AS n_events,
       |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_purchases
       |FROM islands GROUP BY user_id, sid""".stripMargin
}
