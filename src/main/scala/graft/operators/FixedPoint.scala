package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact aggregation of decimal-valued doubles (money, 4 dp metrics).
  *
  * `round(sum(double), 4)` is not hash-stable across engines or
  * partitionings: the summation order shifts the last ulp, and a group
  * landing on a 4 dp half boundary rounds differently (observed at
  * sf0.1 — see SCALING.md "Cross-engine FP determinism"). For columns
  * that are decimals BY CONTRACT (TPC-H money is 2 dp, the events
  * value is 4 dp — verified against the corpus), quantizing each value
  * once (lossless), summing as BIGINT (exact), and dividing once is
  * bit-deterministic everywhere and loses nothing.
  *
  * The BIGINT accumulator is exact to ±9.2·10¹⁸ fixed-point units;
  * the final double conversion is exact below 2⁵³ units (~9·10⁸ in
  * currency at 4 dp — switch the output to DECIMAL if a single group
  * can exceed that). */
object FixedPoint {

  /** Exact Σ of ≤4-decimal values, emitted as the usual 4 dp double. */
  def sum4(c: Column): Column =
    round(sum(round(c * 10000).cast("long")).cast("double") / 10000.0, 4)

  /** DuckDB twin of [[sum4]]. */
  def sum4Sql(expr: String): String =
    s"round(CAST(sum(CAST(round(($expr) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4)"

  /** The raw BIGINT fixed-point unit sum — for ratios computed AFTER
    * exact summation (integer ppm shares: divide once, at the end). */
  def sum4Units(c: Column): Column = sum(round(c * 10000).cast("long"))

  def sum4UnitsSql(expr: String): String =
    s"CAST(sum(CAST(round(($expr) * 10000) AS BIGINT)) AS BIGINT)"
}
