package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-side validation (the engine-side analog of the reference's
  * pydantic gate, services/ingestion/src/schemas/analytics_event.py:7-51:
  * typed fields, required event type, URL/IP shape checks, value
  * bounds). Expressed as an ordered rule chain — first failing rule
  * names the reject reason, mirroring how pydantic reports the first
  * validation error — entirely in codegen'd expressions, so validation
  * runs at scan speed and invalid rows can be routed to a quarantine
  * sink instead of silently dropped. */
object Validator {

  /** (rule name, predicate that must HOLD for a valid row). */
  def rules: Seq[(String, Column)] = Seq(
    "missing_ts" -> col("ts").isNotNull,
    "missing_type" -> col("event_type").isNotNull,
    "bad_type_format" -> col("event_type").rlike("^[a-z_]+$"),
    "negative_user" -> (col("user_id") >= 0),
    "value_out_of_range" ->
      (col("value").isNull || (col("value") >= 0 && col("value") < 1000000)))

  /** Annotate each event with validity + first failing rule. */
  def validate(events: DataFrame): DataFrame = {
    val reason = rules.foldRight(lit(null).cast("string")) {
      case ((name, pred), acc) => when(!coalesce(pred, lit(false)), name).otherwise(acc)
    }
    events.select(
      col("event_id"),
      reason.as("reject_reason"),
      reason.isNull.as("is_valid"))
  }

  def validateSql: String = {
    val sqlRules = Seq(
      "missing_ts" -> "ts IS NOT NULL",
      "missing_type" -> "event_type IS NOT NULL",
      "bad_type_format" -> "regexp_matches(event_type, '^[a-z_]+$')",
      "negative_user" -> "user_id >= 0",
      "value_out_of_range" -> "(value IS NULL OR (value >= 0 AND value < 1000000))")
    val reason = sqlRules.foldRight("CAST(NULL AS VARCHAR)") {
      case ((name, pred), acc) =>
        s"CASE WHEN NOT coalesce($pred, false) THEN '$name' ELSE $acc END"
    }
    s"""SELECT event_id, $reason AS reject_reason,
       |       ($reason) IS NULL AS is_valid
       |FROM events""".stripMargin
  }
}
