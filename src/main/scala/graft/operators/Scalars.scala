package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar-expression operators from SURVEY §2.2 that aren't already
  * embedded in the window queries: JSON decode (P16), timestamp
  * coercions (P8/P10/P15), and the projection+filter shape whose
  * predicates must reach the parquet scan (P1/P5-P7).
  *
  * All stay inside whole-stage codegen — `get_json_object`,
  * `unix_millis`, `date_format` are Catalyst expressions, no UDFs.
  */
object Scalars {

  /** JSON property extraction + aggregation over the extracted key.
    * Reference parses JSON payloads at every hop (producer.py:39,
    * kafka_source.py:16); here: props is a JSON string column. */
  def jsonPropsAgg(events: DataFrame): DataFrame =
    events
      .select(get_json_object(col("props"), "$.k").cast("long").as("k_val"),
              col("value"))
      .groupBy(col("k_val"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("value_sum"))

  /** Epoch-ms ↔ ISO-second ↔ hour-bucket coercions (storage consumer
    * normalizes ISO strings, consumer.py:13-20; cache parser epoch-ms,
    * message_parser.py:51-62). */
  def tsCoercions(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      unix_millis(col("ts")).as("ts_ms"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("iso_sec"),
      unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"))

  /** Narrow projection + selective filter: Catalyst must push both the
    * predicate and the 3-column read schema into the parquet scan. */
  def filterProject(events: DataFrame, minValue: Double = 50.0): DataFrame =
    events
      .filter(col("event_type") === "purchase" &&
              col("value").isNotNull && col("value") > minValue)
      .select(col("event_id"), col("user_id"), col("value"))
}
