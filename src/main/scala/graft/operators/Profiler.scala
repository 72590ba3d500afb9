package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profile: per-column row/null/distinct counts and
  * min/max, unpivoted to one row per column — the first query anyone
  * runs against an unfamiliar 100 TB table, and the validation gate a
  * pipeline runs after every load.
  *
  * One aggregate computes every column's count/min/max stats in a
  * single scan (partial-aggregated map-side); the k exact-distinct
  * counts run as k additional single-column pruned scans cross-joined
  * onto the 1-row stats (see the shape note below — this avoids the
  * Expand a fused multi-distinct would plan). NOTE: that makes the
  * profile k+1 independent Spark jobs, NOT one atomic pass — against a
  * table mutated between jobs the per-column snapshots can be mutually
  * inconsistent; profile an immutable snapshot (or a pinned version)
  * when that matters. `approxDistinct = true` keeps the same shape with
  * HLL instead of exact distinct. */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val stats = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // distinct counts as one single-column aggregate per column, cross-
    // joined onto the 1-row stats: a SINGLE agg with k exact distincts
    // would plan an Expand (k+1 copies of every row through the
    // shuffle); per-column aggregates instead read one pruned column
    // each — on columnar storage that is the same bytes as the fused
    // scan, with partial aggregation and no row multiplication.
    val total = cols.foldLeft(stats) { (acc, c) =>
      acc.crossJoin(df.agg(
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__nd_$c")))
    }
    // unpivot: one struct literal per column, exploded to rows
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        col(s"__mn_$c").as("min_str"), col(s"__mx_$c").as("max_str"))
    }
    total.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** events-table profile used by the oracle-checked query. */
  def profileEvents(events: DataFrame): DataFrame =
    profile(events, Seq("event_id", "user_id", "event_type", "value"))

  def profileEventsSql: String = {
    val cols = Seq("event_id", "user_id", "event_type", "value")
    cols.map { c =>
      s"""SELECT '$c' AS column, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_str,
         |  CAST(max($c) AS VARCHAR) AS max_str
         |FROM events""".stripMargin
    }.mkString("\nUNION ALL\n")
  }
}
