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
}
