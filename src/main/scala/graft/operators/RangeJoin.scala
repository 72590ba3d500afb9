package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range self join: pairs of events on the same key within a time
  * window of each other. Spark has no range-join optimization — the
  * naive `a.key = b.key AND |a.t - b.t| <= w` plans as a hash join on
  * the key followed by a per-key cross product, quadratic in the hot
  * key's row count.
  *
  * Scalable shape instead: bin timestamps to `w`-sized buckets and join
  * on (key, bin), with the right side exploded to its bin and successor
  * — any pair within `w` differs by at most one bin, so candidates are
  * bounded by bin occupancy, not key cardinality. The exact predicate
  * filters the candidates. (Same idea as the LSH/IVF bucket joins: make
  * the join key carry the locality.)
  */
object RangeJoin {

  /** Distinct pairs (a_id < b_id) of events with the same `keyCol`
    * within `windowMs` of each other. */
  def withinTimePairs(events: DataFrame, keyCol: String = "user_id",
                      timeCol: String = "ts", idCol: String = "event_id",
                      windowMs: Long = 60000L): DataFrame = {
    val base = events.select(
      col(keyCol).as("k"), col(idCol).as("id"),
      unix_millis(col(timeCol)).as("tms"))
    val left = base
      .withColumn("bin", floor(col("tms") / windowMs))
    // pair order is by id, not time, so b may precede OR follow a:
    // |Δt| <= w bounds the bin difference to ±1 — explode to all three
    val right = base
      .withColumn("bin", explode(array(
        floor(col("tms") / windowMs) - 1,
        floor(col("tms") / windowMs),
        floor(col("tms") / windowMs) + 1)))
      .select(col("k"), col("id").as("b_id"), col("tms").as("b_tms"), col("bin"))
    left.join(right, Seq("k", "bin"))
      .filter(col("id") < col("b_id") &&
        abs(col("tms") - col("b_tms")) <= windowMs)
      .select(col("k"), col("id").as("a_id"), col("b_id"))
      .distinct()
  }

  /** Per-key count of within-window pairs (burstiness measure). */
  def withinTimeCounts(events: DataFrame, keyCol: String = "user_id",
                       timeCol: String = "ts", idCol: String = "event_id",
                       windowMs: Long = 60000L): DataFrame =
    withinTimePairs(events, keyCol, timeCol, idCol, windowMs)
      .groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("pair_count"))

  def withinTimeCountsSql(windowMs: Long = 60000L): String =
    s"""SELECT a.user_id, count(*) AS pair_count
       |FROM events a JOIN events b
       |  ON a.user_id = b.user_id AND a.event_id < b.event_id
       | AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= $windowMs
       |GROUP BY a.user_id""".stripMargin
}
