package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-spreading aggregation.
  *
  * A hot group key funnels its whole group through one reducer. For
  * plain count/sum Spark's partial aggregation already absorbs skew
  * map-side; the case that genuinely needs salting is exact
  * COUNT(DISTINCT) on a hot key, where all distinct values of the key
  * must meet in one task.
  *
  * [[saltedCountDistinct]] stays EXACT: the salt is derived from the
  * distinct column itself, so each salt bucket sees a disjoint slice of
  * the value domain — phase 1 computes disjoint partial distincts over
  * `salts`× more reducers, phase 2 sums them. Result is identical to
  * the unsalted aggregate (oracle-checked), with the hot key spread
  * over `salts` tasks.
  */
object Skew {
  def saltedCountDistinct(df: DataFrame, keys: Seq[String],
                          distinctCol: String, salts: Int = 32,
                          resultName: String = "distinct_count"): DataFrame =
    df
      .withColumn("_salt", pmod(xxhash64(col(distinctCol)), lit(salts)))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(countDistinct(col(distinctCol)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(resultName))
}
