package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAggregator
import graft.streaming.EventWire

/** Wire-level contract for the Kafka path, broker-free: records are
  * built in the EXACT relation shape spark-sql-kafka produces
  * ([[EventWire.kafkaRecordSchema]] — binary key/value, coordinates,
  * timestamp, headers), so the bytes→rows→bytes path exercised here is
  * the one a real `format("kafka")` read would take. Pins the byte-level
  * behavior of the reference source (kafka_source.py:6-19: JSON value,
  * ignore-parse-errors, fail-on-missing-field=false) and the sink's JSON
  * value encoding (kafka_sink.py:10-46).
  */
class KafkaWireSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** A canonical wire event: every nested-schema field present, schema
    * field order, no whitespace — the bytes the reference producer
    * (shared/schemas, HTTP ingest) actually puts on the topic. */
  private def wireJson(id: String, typ: String, user: String, sess: String,
                       loadTime: Long, tsMs: Long): String =
    s"""{"event":{"id":"$id","type":"$typ"},""" +
      s""""device":{"user_agent":"Mozilla Mobile","screen_width":390,"screen_height":844},""" +
      s""""user":{"id":"$user"},""" +
      s""""context":{"url":"https://ex.com/p","referrer":"https://ref.com","ip_address":"10.0.0.1","session_id":"$sess"},""" +
      s""""properties":{"k":"v"},""" +
      s""""metrics":{"load_time":$loadTime,"interaction_time":12},""" +
      s""""timestamp":$tsMs}"""

  private val base = 1714867200000L

  private def kafkaRecord(value: String, offset: Long): Row = Row(
    s"key-$offset".getBytes(UTF_8),
    value.getBytes(UTF_8),
    "analytics_events", 0, offset, new Timestamp(base + offset), 0,
    Seq(Row("source", "web".getBytes(UTF_8))))

  private def recordsDf(values: Seq[String]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        values.zipWithIndex.map { case (v, i) => kafkaRecord(v, i.toLong) }),
      EventWire.kafkaRecordSchema)

  test("binary Kafka records decode; malformed and missing-required drop silently") {
    val good = wireJson("e1", "view", "u1", "s1", 250L, base + 1000)
    val truncated = good.dropRight(25) // mid-structure cut: unparseable
    val notJson = "\u0000\u0001\u0002 not json at all"
    val missingType = // parseable but no event.type → required-field drop
      s"""{"event":{"id":"e3"},"user":{"id":"u3"},"timestamp":${base + 2000}}"""
    val missingOptional = // no device/context/metrics → NULLs, row survives
      s"""{"event":{"id":"e4","type":"click"},"user":{"id":"u4"},"timestamp":${base + 3000}}"""

    val decoded = EventWire.decodeKafka(
      recordsDf(Seq(good, truncated, notJson, missingType, missingOptional)))
    val rows = decoded.collect().map(r => r.getAs[String]("event_id") -> r).toMap
    assert(rows.keySet == Set("e1", "e4"),
      s"ignore-parse-errors/fail-on-missing-field semantics violated: ${rows.keySet}")
    val e1 = rows("e1")
    assert(e1.getAs[String]("event_type") == "view")
    assert(e1.getAs[String]("user_id") == "u1")
    assert(e1.getAs[Long]("load_time") == 250L)
    assert(e1.getAs[Long]("timestamp_ms") == base + 1000)
    assert(e1.getAs[Timestamp]("event_time").getTime == base + 1000)
    val e4 = rows("e4")
    assert(e4.isNullAt(e4.fieldIndex("user_agent")), "missing field must decode as NULL")
    assert(e4.isNullAt(e4.fieldIndex("load_time")))
  }

  test("canonical wire JSON survives decode→re-encode byte-for-byte") {
    val originals = Seq(
      wireJson("e1", "view", "u1", "s1", 250L, base + 1000),
      wireJson("e2", "purchase", "u2", "s2", 90L, base + 61000))
    val back = EventWire.reencode(recordsDf(originals)
        .select(col("value").cast("string").as("value")))
      .as[String].collect().toSeq
    assert(back.toSet == originals.toSet,
      "wire JSON is not byte-identical after a schema round-trip")
  }

  test("decoded records flow through the windowed aggregate into exact sink bytes") {
    val values = Seq(
      wireJson("e1", "view", "u1", "s1", 100L, base + 1000),
      wireJson("e2", "view", "u2", "s1", 100L, base + 2000),
      wireJson("e3", "view", "u1", "s1", 100L, base + 3000), // dup user in window
      wireJson("e4", "purchase", "u3", "s2", 100L, base + 65000))
    val agg = EventAggregator.aggregate(
      EventWire.decodeKafka(recordsDf(values)), timeCol = "event_time")
    val wire = EventWire.encode(agg).as[String].collect().toSet
    // exact sink bytes: epoch-millis window bounds (the engine's
    // documented timestamp contract), sink-schema field order
    assert(wire == Set(
      s"""{"window_start_ms":$base,"window_end_ms":${base + 60000},"event_type":"view","event_count":3,"user_count":2}""",
      s"""{"window_start_ms":${base + 60000},"window_end_ms":${base + 120000},"event_type":"purchase","event_count":1,"user_count":1}"""))
  }

  test("at-least-once replay: consume-side dedup restores the exactly-once result") {
    val values = Seq(
      wireJson("e1", "view", "u1", "s1", 100L, base + 1000),
      wireJson("e2", "view", "u2", "s1", 100L, base + 2000),
      wireJson("e3", "purchase", "u3", "s2", 100L, base + 65000))
    // the producer crashed after emitting, before committing: the whole
    // batch replays at later offsets — every record delivered twice
    val replayed = recordsDf(values ++ values)
    val exactlyOnce = EventAggregator.aggregate(
      EventWire.decodeKafka(recordsDf(values)), timeCol = "event_time")
    val deduped = EventAggregator.aggregate(
      graft.streaming.Idempotence.dedupOnRead(
        EventWire.decodeKafka(replayed), keys = Seq("event_id")),
      timeCol = "event_time")
    assert(EventWire.encode(deduped).as[String].collect().toSet ==
      EventWire.encode(exactlyOnce).as[String].collect().toSet,
      "decode → dedup → agg must equal the exactly-once pipeline")
    // without the dedup the duplication is visible (the gap being closed)
    val naive = EventAggregator.aggregate(
      EventWire.decodeKafka(replayed), timeCol = "event_time")
    assert(EventWire.encode(naive).as[String].collect().toSet !=
      EventWire.encode(exactlyOnce).as[String].collect().toSet)
  }

  test("aggregate-row replay: last-batch-wins on the (window, keys) identity") {
    val rows = Seq(
      (base, "view", 3L, 2L, 7L),  // batch 7's emission
      (base, "view", 3L, 2L, 7L),  // ...delivered again (at-least-once)
      (base, "view", 4L, 3L, 8L),  // batch 8 re-emits the window updated
      (base + 60000L, "purchase", 1L, 1L, 7L))
      .toDF("window_start_ms", "event_type", "event_count", "user_count", "batch_id")
    val got = graft.streaming.Idempotence.dedupOnRead(
        rows, keys = Seq("window_start_ms", "event_type"))
      .orderBy("window_start_ms")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (base, "view", 4L, 3L, 8L),
      (base + 60000L, "purchase", 1L, 1L, 7L)))
  }
}
