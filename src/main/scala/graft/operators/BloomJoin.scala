package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered semi join: the scale pattern for "keep fact rows
  * whose key appears in a filter set" when the filter set is too big to
  * broadcast as a hash relation but its Bloom filter is not.
  *
  * 1. aggregate the filter side into one Bloom filter
  *    (BloomFilterAggregate — the same native expression Catalyst's
  *    InjectRuntimeFilter uses, over XxHash64 of the key);
  * 2. prefilter the fact side with might_contain, map-side in the scan
  *    stage — no shuffle touches the dropped rows;
  * 3. confirm with an exact left-semi join, so false positives are
  *    removed and the result is EXACTLY the semi join (oracle-checked).
  *
  * Shuffle volume becomes O(matches + fp·|fact|) instead of O(|fact|).
  * Catalyst's own runtime filter does this automatically only under
  * size/selectivity heuristics and never for disk-spilling filter sets;
  * this operator makes the plan explicit and unconditional.
  *
  * Reference has no joins at all (SURVEY §2.3); this covers the
  * training-data curation step "restrict the corpus to an allowlist /
  * to ids that survived an upstream stage" at 100 TB.
  */
object BloomJoin {

  /** Exact left-semi of `big` against `small`'s key set, Bloom-prefiltered.
    * @param expectedKeys sizing for the Bloom filter (bits = 8×, capped
    *   at 64 MB so the broadcast stays executor-friendly) */
  def semiJoin(big: DataFrame, bigKey: String, small: DataFrame,
               smallKey: String, expectedKeys: Long = 1000000L): DataFrame = {
    val numBits = math.min(expectedKeys * 8L, 512L * 1024 * 1024)
    val bloomAgg = toColumn(new BloomFilterAggregate(
      new XxHash64(Seq(toExpr(small(smallKey)))),
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression())
    // one row, one binary cell (the sketch itself): a driver collect of
    // the same shape as any broadcast build side
    val bloom = small.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val prefiltered = big.filter(mightContain(bloom, big(bigKey)))
    prefiltered.join(small.select(col(smallKey)).distinct(),
      big(bigKey) === small(smallKey), "left_semi")
  }

  /** might_contain(bloom, xxhash64(key)) as a Column; null bloom (empty
    * build side) yields null → filter-false, matching empty-semi-join. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    toColumn(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      Literal(bloom, BinaryType), new XxHash64(Seq(toExpr(key)))))

  /** Headline query: revenue of lineitems belonging to URGENT orders,
    * by return flag — the fact table never shuffles un-matched rows. */
  def urgentRevenue(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
    semiJoin(lineitem, "l_orderkey", urgent, "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"),
        count(lit(1)).as("n_items"))
  }

  def urgentRevenueSql: String =
    """SELECT l_returnflag,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
      |       count(*) AS n_items
      |FROM lineitem l
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_orderkey = l.l_orderkey
      |                AND o.o_orderpriority = '1-URGENT')
      |GROUP BY 1""".stripMargin
}
