package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set operations over derived row sets (SURVEY §2.8 — absent in the
  * reference; engine-complete here).
  *
  * Spark plans EXCEPT/INTERSECT DISTINCT as left-anti / left-semi
  * hash joins after per-side aggregation — both sides shuffle once on
  * the full row as key; AQE broadcasts the smaller side when it fits.
  */
object SetOps {

  /** User-days with a view but no purchase (EXCEPT DISTINCT): the
    * audience-segmentation shape — set difference of two filtered
    * projections of the same fact table. Day granularity (epoch-day
    * BIGINT, identical in both engines) keeps the difference non-empty
    * on realistic data, where nearly every user eventually purchases. */
  def viewersWhoNeverPurchased(events: DataFrame): DataFrame = {
    def userDays(t: String) = events.filter(col("event_type") === t)
      .select(col("user_id"),
        floor(unix_millis(col("ts")) / 86400000L).cast("long").as("day_num"))
    userDays("view").distinct().except(userDays("purchase"))
  }

  def viewersWhoNeverPurchasedSql: String =
    """SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day_num
      |FROM events WHERE event_type = 'view'
      |EXCEPT
      |SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day_num
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  /** Users who both viewed and purchased (INTERSECT DISTINCT). */
  def viewersWhoAlsoPurchased(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "view").select(col("user_id")).distinct()
      .intersect(
        events.filter(col("event_type") === "purchase").select(col("user_id")))

  def viewersWhoAlsoPurchasedSql: String =
    """SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
      |INTERSECT
      |SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'""".stripMargin

  /** FULL OUTER reconciliation: every user's view and purchase counts
    * side by side with a segment label — the "diff two aggregates,
    * keep rows unique to either side" shape (snapshot reconciliation,
    * A/B cohort diffing). Both sides pre-aggregate BEFORE the join, so
    * the full-outer exchange carries one row per user per side, not
    * raw events. */
  def userActivityMatrix(events: DataFrame): DataFrame = {
    def side(t: String, n: String) = events
      .filter(col("event_type") === t)
      .groupBy(col("user_id")).agg(count(lit(1)).as(n))
    side("view", "n_views")
      .join(side("purchase", "n_purchases"), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        when(col("n_views").isNull, "purchase_only")
          .when(col("n_purchases").isNull, "view_only")
          .otherwise("both").as("segment"))
  }

  def userActivityMatrixSql: String =
    """SELECT COALESCE(v.user_id, p.user_id) AS user_id,
      |       COALESCE(v.n_views, 0) AS n_views,
      |       COALESCE(p.n_purchases, 0) AS n_purchases,
      |       CASE WHEN v.user_id IS NULL THEN 'purchase_only'
      |            WHEN p.user_id IS NULL THEN 'view_only'
      |            ELSE 'both' END AS segment
      |FROM (SELECT user_id, count(*) AS n_views FROM events
      |      WHERE event_type = 'view' GROUP BY 1) v
      |FULL OUTER JOIN
      |     (SELECT user_id, count(*) AS n_purchases FROM events
      |      WHERE event_type = 'purchase' GROUP BY 1) p
      |ON v.user_id = p.user_id""".stripMargin
}
