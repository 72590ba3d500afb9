package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering keys.
  *
  * At 100 TB, file-level min/max pruning only skips files for the ONE
  * column the data is sorted by; sorting by the bit-interleaved key of
  * two columns gives every file a tight bounding box in BOTH dimensions
  * (the Delta/Iceberg `ZORDER BY` technique), so range predicates on
  * either column prune files. The key is pure bit arithmetic —
  * `(x>>b & 1) << 2b  |  (y>>b & 1) << (2b+1)` summed over b — which
  * DuckDB reproduces exactly, so layouts are oracle-checkable like
  * everything else.
  */
object Layout {

  /** Morton key of two non-negative ints, `bits` bits each (≤ 31;
    * callers clamp/bucket inputs into range first). */
  def zkey(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      (shiftleft(shiftright(x, b).bitwiseAND(1), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(1), 2 * b + 1)): Column
    }.reduce(_ + _)

  def zkeySql(x: String, y: String, bits: Int = 16): String =
    "(" + (0 until bits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ") + ")"

  /** Inverse (for tests): extract dimension `dim` (0 = x, 1 = y). */
  def unzkey(z: Column, dim: Int, bits: Int = 16): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(z, 2 * b + dim).bitwiseAND(1), b): Column
    }.reduce(_ + _)

  /** Writes `df` parquet files clustered on the z-curve of (x, y):
    * range-partition by zkey (balanced file sizes), sort within files —
    * each output file then covers a compact (x, y) rectangle. */
  def zorderWrite(df: DataFrame, x: String, y: String, path: String,
                  bits: Int = 16, files: Int = 8): Unit =
    df.withColumn("__z", zkey(col(x), col(y), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Z-curve range histogram over orders (custkey × day): one bucket
    * per high-order z prefix — the query shape that proves both
    * dimensions cluster. */
  def zHistogram(orders: DataFrame, bits: Int = 10, shift: Int = 14): DataFrame =
    orders
      .select(zkey(col("o_custkey").bitwiseAND((1 << bits) - 1),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .bitwiseAND((1 << bits) - 1), bits).as("z"))
      .groupBy(shiftright(col("z"), shift).as("z_bucket"))
      .agg(count(lit(1)).as("n"))

  def zHistogramSql(bits: Int = 10, shift: Int = 14): String = {
    val mask = (1 << bits) - 1
    val z = zkeySql(s"(o_custkey & $mask)",
      s"(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) & $mask)", bits)
    s"""SELECT ($z >> $shift) AS z_bucket, count(*) AS n
       |FROM orders GROUP BY 1""".stripMargin
  }
}
