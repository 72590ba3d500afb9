package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the zero-shuffle path for repeated
  * fact-to-fact joins.
  *
  * Broadcasting handles small dims; when BOTH join sides are big (fact ⋈
  * fact, e.g. lineitem ⋈ orders at 100 TB), every query re-shuffles both
  * unless the tables are written bucketed by the join key: matching
  * bucket counts make the join a per-bucket zipper — no Exchange in the
  * plan (asserted in BucketingSpec), amortizing one write-time shuffle
  * across every subsequent join/aggregation on that key.
  */
object Bucketing {

  /** Write a table bucketed (and sorted) by the join key. One-time cost;
    * table name is registered in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int = 8): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Per-order revenue: a fact ⋈ fact join that is shuffle-free when
    * both inputs are bucketed on the order key. */
  def orderRevenue(spark: SparkSession, lineitemTable: String,
                   ordersTable: String): DataFrame =
    spark.table(lineitemTable)
      .join(spark.table(ordersTable), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(FixedPoint.sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
}
