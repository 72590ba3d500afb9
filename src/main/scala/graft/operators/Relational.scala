package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational analytics over the star schema.
  *
  * The reference has no joins (SURVEY §2.3) — these exist because a
  * complete engine needs them and because join strategy is where 100 TB
  * plans live or die: dimensions are broadcast (no shuffle of the fact
  * table), the fact table shuffles at most once on the aggregation key,
  * and semi joins never materialize the probe side.
  *
  * Money sums are rounded to 4 dp: inputs have ≤ 4 decimals, so true
  * sums sit ON the 4dp grid — rounding is then engine-independent even
  * though double summation order differs (the per-engine error ~1e-7 is
  * far inside the 5e-5 rounding radius).
  */
object Relational {

  /** Revenue per nation: fact ⋈ broadcast dims, one shuffle (groupBy). */
  def revenueByNation(lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame): DataFrame =
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))

  def revenueByNationSql: String =
    """SELECT n_name,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Top-N customers by spend (deterministic: rounded spend + key). */
  def topCustomers(orders: DataFrame, customer: DataFrame, n: Int = 10): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("o_totalprice")), 4).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(n)

  def topCustomersSql(n: Int = 10): String =
    s"""SELECT c_custkey, c_name,
       |       round(sum(o_totalprice), 4) AS total_spend,
       |       count(*) AS n_orders
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_custkey, c_name
       |ORDER BY total_spend DESC, c_custkey LIMIT $n""".stripMargin

  /** Orders with at least one line shipped after the order date, counted
    * per priority — a LEFT SEMI join (EXISTS): the probe side is never
    * materialized into the output. */
  def lateOrders(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  def lateOrdersSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** Churned customers (NOT EXISTS via left-anti join): no order since
    * `cutoff`. The date filter prunes the right side BEFORE the join
    * (pushed into the orders scan); the anti join shuffles both sides
    * on the key, and AQE picks broadcast-anti when the filtered order
    * side fits. */
  def idleCustomers(customer: DataFrame, orders: DataFrame,
                    cutoff: String = "1999-01-01"): DataFrame =
    customer
      .join(orders.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))

  def idleCustomersSql(cutoff: String = "1999-01-01"): String =
    s"""SELECT c_custkey, c_name, c_nationkey
       |FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderdate >= TIMESTAMP '$cutoff')""".stripMargin
}
