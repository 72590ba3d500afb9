package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Spark 4's `transformWithState` (the successor to
  * flatMapGroupsWithState): per-user running activity counters with
  * state TTL — the serving-layer "live user profile" kept inside the
  * stream processor instead of Redis (reference keeps per-window hashes
  * with a 6 h TTL, `services/cache/src/core/config.py:23-24`; the TTL
  * here plays the same retention role, enforced by the state store
  * itself).
  *
  * Why TWS over fMGWS: typed composite state (Value/List/Map) instead
  * of one case-class blob, store-enforced TTL instead of hand-rolled
  * timeout bookkeeping, and timers decoupled from data arrival. Scale:
  * state lives in the RocksDB provider (TWS requires it) — disk-backed,
  * bounded executor memory at any key cardinality.
  */
object UserActivity {

  case class Update(user_id: Long, n_events: Long, n_purchases: Long,
                    last_ms: Long)

  /** Keyed processor: counts events + purchases per user; with
    * `ttlMs > 0` (processing-time mode) state expires after that much
    * inactivity. NOTE: TTL forces ProcessingTime mode, and a
    * processing-time stateful query self-triggers empty micro-batches
    * to run expiry — `processAllAvailable` never settles, so bounded
    * jobs/tests should run the `ttlMs = 0` (TimeMode.None) variant. */
  class Processor(ttlMs: Long)
      extends StatefulProcessor[Long, (Long, String, Long), Update] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[Update] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Update]("activity",
        Encoders.product[Update],
        if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
        else TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
                                 timers: TimerValues): Iterator[Update] = {
      var cur = Option(state.get()).getOrElse(Update(key, 0L, 0L, 0L))
      rows.foreach { case (_, typ, tms) =>
        cur = Update(key, cur.n_events + 1,
          cur.n_purchases + (if (typ == "purchase") 1 else 0),
          math.max(cur.last_ms, tms))
      }
      state.update(cur)
      Iterator.single(cur)
    }
  }

  /** events (event_id/ts/user_id/event_type/value…) → one Update row
    * per active user per micro-batch. ttlMs = 0 disables expiry (and
    * the processing-time self-triggering that comes with it). */
  def updates(events: DataFrame, ttlMs: Long = 0L): Dataset[Update] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_millis(col("ts")).as("tms"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor(ttlMs),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }
}
