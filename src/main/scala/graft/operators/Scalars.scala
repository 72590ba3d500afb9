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
      .agg(count(lit(1)).as("n"), FixedPoint.sum4(col("value")).as("value_sum"))

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

  /** String→number type sniffing (P14): the reference cache reads hash
    * values back as strings and coerces int → float → string in that
    * order (services/cache/src/infrastructure/redis/repository.py:
    * 117-127). Same ladder here over three raw strings per event (a pure
    * integer, a synthesized decimal, a word). The integer rung is a
    * regex, not a cast: engines disagree on casting decimal strings to
    * integers (DuckDB rounds '42.7'→43 where ANSI Spark refuses), and
    * Python's int() — the semantics being mirrored — refuses too. */
  def typeSniff(events: DataFrame): DataFrame = {
    val isInt = regexp_like(col("raw"), lit("^-?[0-9]+$"))
    val asDouble = expr("try_cast(raw AS DOUBLE)")
    events
      .select(col("event_id"), explode(array(
        col("user_id").cast("string"),
        concat_ws(".", col("user_id").cast("string"),
          length(col("event_type")).cast("string")),
        col("event_type"))).as("raw"))
      .select(col("event_id"), col("raw"),
        when(isInt, "int").when(asDouble.isNotNull, "float")
          .otherwise("string").as("kind"),
        when(isInt, expr("try_cast(raw AS BIGINT)")).as("int_val"),
        round(asDouble, 4).as("num_val"))
  }

  val typeSniffSql: String =
    """WITH raws AS (
      |  SELECT event_id, unnest([
      |    CAST(user_id AS VARCHAR),
      |    CAST(user_id AS VARCHAR) || '.' || CAST(length(event_type) AS VARCHAR),
      |    event_type]) AS raw
      |  FROM events)
      |SELECT event_id, raw,
      |  CASE WHEN regexp_matches(raw, '^-?[0-9]+$') THEN 'int'
      |       WHEN TRY_CAST(raw AS DOUBLE) IS NOT NULL THEN 'float'
      |       ELSE 'string' END AS kind,
      |  CASE WHEN regexp_matches(raw, '^-?[0-9]+$')
      |       THEN CAST(raw AS BIGINT) END AS int_val,
      |  round(TRY_CAST(raw AS DOUBLE), 4) AS num_val
      |FROM raws""".stripMargin
}
