package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Push-notification channel for metric updates — the Redis pub/sub
  * analog (reference: `services/cache/src/infrastructure/redis/
  * repository.py:105-108` publishes a JSON payload on `cache:updates`
  * after storing metric windows; `shared/constants/redis_keys.py:15`
  * names the channel; the websocket layer subscribes).
  *
  * The Spark-native analog is a durable notification LOG plus a
  * streaming subscription instead of a broker socket:
  *  - [[publishBatch]] appends one message row per updated
  *    (metric_type, window) to a parquet log as each micro-batch of
  *    metrics lands — the publish-after-store hook, same payload shape
  *    (channel + JSON dict of the window's fields).
  *  - [[subscribe]] is a file-source `readStream` over the log: every
  *    subscriber gets push-style delivery of new messages, and — an
  *    improvement over Redis pub/sub, which drops messages published
  *    while a subscriber is away — a late subscriber replays the
  *    backlog from any `startingOffset` it chooses (the log is the
  *    state, as with Kafka-style pub/sub).
  *
  * Delivery semantics match the reference faithfully: Redis pub/sub
  * re-publishes when a crashed writer replays its store, so consumers
  * see duplicates there too — appends here are likewise at-least-once
  * (a replayed batch re-appends its messages). Consumers that need the
  * exactly-once VIEW apply [[Idempotence.dedupOnRead]] on
  * (metric_type, window_start_ms) preferring batch_id — one window
  * shuffle over message-sized rows.
  *
  * Scale shape: messages are per-(type, window) aggregate rows —
  * metadata-sized, orders below the raw stream; the publisher is one
  * map + append per micro-batch, the subscriber a file-source stream
  * whose listing cost is bounded by log compaction/retention like any
  * file stream. */
object Notifications {

  /** The reference's channel constant (`redis_keys.py:15`). */
  val UpdatesChannel = "cache:updates"

  val schema: StructType = StructType(Seq(
    StructField("channel", StringType, nullable = false),
    StructField("metric_type", StringType, nullable = false),
    StructField("window_start_ms", LongType, nullable = false),
    StructField("payload", StringType, nullable = false),
    StructField("batch_id", LongType, nullable = false)))

  /** One message per updated window in this micro-batch: the
    * publish-after-store hook. `windowCol` must be an epoch-ms long
    * column; every other column rides inside the JSON payload (the
    * reference publishes the stored field dict verbatim). */
  def publishBatch(batch: DataFrame, batchId: Long, path: String,
                   metricType: String,
                   windowCol: String = "window_start_ms"): Unit = {
    val payloadCols = batch.columns.sorted.map(col)
    batch.select(
        lit(UpdatesChannel).as("channel"),
        lit(metricType).as("metric_type"),
        col(windowCol).cast("long").as("window_start_ms"),
        to_json(struct(payloadCols: _*)).as("payload"),
        lit(batchId).as("batch_id"))
      .write.mode("append").parquet(path)
  }

  /** Publisher leg: its own query over the metrics stream (multi-query
    * topology, like every sink here), appending messages per batch. */
  def startPublisher(metrics: DataFrame, path: String, checkpoint: String,
                     metricType: String,
                     windowCol: String = "window_start_ms"): StreamingQuery =
    metrics.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        publishBatch(batch, batchId, path, metricType, windowCol)
      }
      .start()

  /** Push-style subscription: a streaming DataFrame of messages as they
    * are published. Redis `psub.subscribe(channel)` with a durable
    * backlog. */
  def subscribe(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)
      .filter(col("channel") === UpdatesChannel)

  /** The exactly-once consumer view over the at-least-once log: one
    * surviving message per (type, window), last writer wins. */
  def exactlyOnceView(messages: DataFrame): DataFrame =
    Idempotence.dedupOnRead(messages,
      keys = Seq("metric_type", "window_start_ms"),
      prefer = Seq("batch_id"))
}
