package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wire-format decode for the analytics event stream.
  *
  * Reference: the Kafka JSON source (services/processing/src/connectors/
  * kafka_source.py:6-19) declares a nested schema over JSON bytes with
  * lenient decode — `fail-on-missing-field=false`, `ignore-parse-errors=
  * true`: malformed records are silently dropped, missing fields become
  * NULL. Spark equivalent: `from_json` (PERMISSIVE by default) + a
  * null-filter on required fields.
  *
  * The nested schema mirrors services/processing/src/core/schemas/
  * event_source.py:5-61. [[decode]] is source-agnostic: it takes any
  * DataFrame with a string `value` column (Kafka value, file line,
  * socket payload) — the Kafka specifics are just reader options
  * ([[kafkaOptions]]), kept separate because this environment carries no
  * Kafka connector jar.
  */
object EventWire {

  /** Reference event schema (SURVEY §1.2), nested structs + map. */
  val nestedSchema: StructType = StructType(Seq(
    StructField("event", StructType(Seq(
      StructField("id", StringType), StructField("type", StringType)))),
    StructField("device", StructType(Seq(
      StructField("user_agent", StringType),
      StructField("screen_width", IntegerType),
      StructField("screen_height", IntegerType)))),
    StructField("user", StructType(Seq(StructField("id", StringType)))),
    StructField("context", StructType(Seq(
      StructField("url", StringType), StructField("referrer", StringType),
      StructField("ip_address", StringType),
      StructField("session_id", StringType)))),
    StructField("properties", MapType(StringType, StringType)),
    StructField("metrics", StructType(Seq(
      StructField("load_time", LongType),
      StructField("interaction_time", LongType)))),
    StructField("timestamp", LongType)))

  /** Kafka reader options per the reference source (subscribe topic,
    * earliest offsets). Apply to spark.readStream.format("kafka") when a
    * connector is on the classpath. */
  val kafkaOptions: Map[String, String] = Map(
    "subscribe" -> "analytics_events",
    "startingOffsets" -> "earliest",
    "failOnDataLoss" -> "false")

  /** The Kafka source relation shape — spark-sql-kafka's fixed output
    * schema (key/value as raw bytes, record coordinates, timestamp,
    * headers). Pinned here so wire-level tests compile and run against
    * the exact record layout the connector produces even though this
    * environment carries no Kafka jar: any DataFrame in this shape is
    * indistinguishable from a real `format("kafka")` read downstream. */
  val kafkaRecordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  /** Decode straight off Kafka-shaped records: the connector's `value`
    * bytes are UTF-8 JSON per the reference wire format; everything else
    * (key, coordinates, headers) is transport metadata the reference
    * source ignores too. */
  def decodeKafka(records: DataFrame): DataFrame =
    decode(records.select(col("value").cast("string").as("value")))

  /** Wire-level re-encode: parse `value` against the full nested schema
    * and serialize it back. For a canonical record (every schema field
    * present, schema field order, no whitespace) this is byte-for-byte
    * identity — the property that pins the JSON wire contract. */
  def reencode(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(to_json(from_json(col(valueCol), nestedSchema)).as("value"))

  /** Lenient JSON decode + nested-field projection (P1): string `value`
    * column → flat typed columns + event_time. Rows whose JSON is
    * unparseable or missing the required type/timestamp are dropped —
    * the reference's ignore-parse-errors semantics. */
  def decode(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw
      .select(from_json(col(valueCol), nestedSchema).as("e"))
      .filter(col("e").isNotNull &&
        col("e.event.type").isNotNull && col("e.timestamp").isNotNull)
      .select(
        col("e.event.id").as("event_id"),
        col("e.event.type").as("event_type"),
        col("e.user.id").as("user_id"),
        col("e.context.session_id").as("session_id"),
        col("e.device.user_agent").as("user_agent"),
        col("e.metrics.load_time").as("load_time"),
        col("e.properties").as("properties"),
        col("e.timestamp").as("timestamp_ms"),
        timestamp_millis(col("e.timestamp")).as("event_time"))

  /** Encode aggregate rows back to a JSON wire column (the Kafka sink
    * shape, kafka_sink.py:10-46): one `value` string column. */
  def encode(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
}
