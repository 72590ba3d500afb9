package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication for continuous ingest — the streaming twin of
  * [[graft.dedup.Dedup.exactDedup]].
  *
  * `dropDuplicatesWithinWatermark` keys state by content fingerprint and
  * evicts entries once the watermark passes their event time + delay, so
  * state is bounded by the dedup horizon instead of growing forever —
  * the only viable shape for an unbounded stream. Duplicates arriving
  * within the horizon are suppressed exactly; re-occurrences after the
  * horizon pass through (documented recall bound, tunable via the
  * watermark delay).
  */
object StreamingDedup {

  /** Deduplicate an event stream by (columns) within the watermark
    * horizon. `events` must carry an event-time column named `ts`. */
  def dropDuplicateEvents(events: DataFrame,
                          watermarkDelay: String = "10 seconds",
                          keys: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Deduplicate a document stream by content fingerprint. */
  def dropDuplicateDocs(docs: DataFrame,
                        watermarkDelay: String = "10 seconds"): DataFrame =
    docs
      .withColumn("fp", md5(graft.text.TextAnalysis.normalize(col("text"))))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
}
