package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the latest right row with
  * `rightTime <= leftTime` on the same key — "what was the state when
  * this event happened". Spark SQL has no ASOF JOIN operator (DuckDB
  * and pandas merge_asof do); the naive range-join formulation explodes
  * to |L|·|R| pairs per key before picking the max.
  *
  * Composed Spark-first instead of a custom plan node (preference (a)
  * of the extension ladder): tag and UNION both sides, one window sort
  * per key carrying a running `last(right attrs, ignoreNulls)`, then
  * keep left rows. Cost: ONE shuffle on the key + an in-partition sort —
  * the same plan an ASOF-aware engine would pick, and it scales to any
  * |R| per key without quadratic blowup. Right rows tie-break BEFORE
  * left rows at equal timestamps (asof allows equality).
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (state) side; should be unique per
    *                   (key, time) — pre-dedupe otherwise, or ties make
    *                   the picked row engine-dependent
    * @param keyCols    equi-key column name(s), present on both sides
    * @param leftTime   left event-time column
    * @param rightTime  right event-time column
    * @param payload    right columns to carry (renamed as given) */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // align shapes: key(s), time, side tag, left attrs, right payload
    val lNorm = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select((keyCols.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rNorm = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((keyCols.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side")) // right first at equal time
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(lNorm.unionByName(rNorm)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_t", "_side")
  }
}
