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

  // ------ 6 dp-quantized terms, 4 dp half-up total (the PSI shape).
  // round(sum(round(c, 6)), 4) is boundary-exposed: a sum of 1e-6
  // quanta frequently lands EXACTLY on a 4 dp half boundary (…x50
  // micro-units), and there the engines' last-ulp summation order
  // picks the side — observed at sf0.1, q_window_psi flipping
  // 25.8392 ↔ 25.8393 on 38 of 38858 windows (SCALING.md r16,
  // "Cross-engine FP determinism" follow-up). Quantize each term to
  // 1e-6 (the same per-term contract as before), sum as BIGINT
  // (exact), round half-up to 1e-4 IN INTEGER SPACE, divide once
  // (exact below 2^53). Contract: terms >= 0 (PSI contributions are,
  // by construction — (p−q) and ln(p/q) share sign); integer half-up
  // equals both engines' half-away-from-zero only for non-negatives.

  /** 1e-6 fixed-point units of a non-negative term, pre-aggregation. */
  def units6(c: Column): Column = round(c * 1e6).cast("long")

  /** Half-up 4 dp double from a BIGINT 1e-6-unit sum (>= 0). */
  def units6To4(unitsSum: Column): Column =
    round(floor((unitsSum + lit(50L)).cast("double") / 100.0)
      .cast("double") / 10000.0, 4)

  /** Boundary-stable Σ of 6 dp-quantized non-negative terms as the
    * usual 4 dp double. */
  def sum6Round4(c: Column): Column = units6To4(sum(units6(c)))

  def units6Sql(expr: String): String =
    s"CAST(round(($expr) * 1e6) AS BIGINT)"

  def units6To4Sql(expr: String): String =
    s"round(CAST((($expr) + 50) // 100 AS DOUBLE) / 10000.0, 4)"

  /** DuckDB twin of [[sum6Round4]]. */
  def sum6Round4Sql(expr: String): String =
    units6To4Sql(s"sum(${units6Sql(expr)})")
}
