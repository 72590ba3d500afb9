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
}
