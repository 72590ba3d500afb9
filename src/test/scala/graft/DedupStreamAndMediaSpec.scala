package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.operators.Validator
import graft.streaming.StreamingDedup

class DedupStreamAndMediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Option[Double])
  private val base = 1714867200000L

  test("streaming dedup suppresses duplicates within the watermark horizon") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamingDedup.dropDuplicateEvents(ms.toDF(), "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      ms.addData(Seq(
        Ev(1, new Timestamp(base), 1, "view", Some(1.0)),
        Ev(1, new Timestamp(base + 100), 1, "view", Some(1.0)), // dup same batch
        Ev(2, new Timestamp(base + 200), 2, "click", Some(1.0))))
      q.processAllAvailable()
      ms.addData(Seq(Ev(1, new Timestamp(base + 500), 1, "view", Some(1.0)))) // dup next batch
      q.processAllAvailable()
      ms.addData(Seq(Ev(3, new Timestamp(base + 1000), 3, "view", Some(1.0))))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dedup_stream").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("validator flags malformed rows with the FIRST failing rule") {
    val rows = Seq(
      (1L, Some(base), Some(5L), Some("view"), Some(10.0)),      // valid
      (2L, None, Some(5L), Some("view"), Some(10.0)),            // missing ts
      (3L, Some(base), Some(5L), None, Some(10.0)),              // missing type
      (4L, Some(base), Some(5L), Some("BAD TYPE!"), Some(10.0)), // bad format
      (5L, Some(base), Some(-1L), Some("view"), Some(10.0)),     // negative user
      (6L, Some(base), Some(5L), Some("view"), Some(-3.0)),      // value range
      (7L, Some(base), Some(-1L), None, Some(-3.0)),             // several: first wins
    ).toDF("event_id", "tms", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis($"tms"))
    val got = Validator.validate(rows)
      .select("event_id", "reject_reason").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).isEmpty)
    assert(got(2L).contains("missing_ts"))
    assert(got(3L).contains("missing_type"))
    assert(got(4L).contains("bad_type_format"))
    assert(got(5L).contains("negative_user"))
    assert(got(6L).contains("value_out_of_range"))
    assert(got(7L).contains("missing_type")) // earliest rule in chain order
  }

  test("resize preserves aspect ratio within the target box") {
    val media = Multimodal.synthesizeMedia(Tables.documents(spark, "/root/testdata/sf0.001"))
    val resized = Multimodal.resize(media, 256, 256).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.width <= 256 && r.height <= 256 && r.media.nonEmpty))
  }

  test("feature extraction yields normalized fixed-dim vectors") {
    val media = Multimodal.synthesizeMedia(Tables.documents(spark, "/root/testdata/sf0.001"))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3))
  }
}
