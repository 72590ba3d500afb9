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
        FixedPoint.sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))

  def revenueByNationSql: String =
    """SELECT n_name,
      |       round(CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** TPC-H Q14 shape — promo revenue share per ship month: fact ⋈
    * broadcast part dim, conditional fixed-point revenue aggregates,
    * and the share as integer ppm of the exact unit sums (one division
    * at the very end; DECIMAL(38,0)/HUGEINT headroom for the ×10⁶,
    * the same wrap-proofing as the KS family). */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val promo = when(col("p_type") === "PROMO", disc).otherwise(lit(0.0))
    // ONE aggregate per measure (the exact unit sum); the 4 dp display
    // values derive from it in the final select — sum4 ≡
    // round(sum4Units/10⁴, 4) by definition, so there is a single
    // quantization expression to keep in sync per measure
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(
        FixedPoint.sum4Units(promo).as("pfp"),
        FixedPoint.sum4Units(disc).as("tfp"),
        count(lit(1)).as("n_items"))
      .select(col("ship_month"),
        round(col("pfp").cast("double") / 10000.0, 4).as("promo_revenue"),
        round(col("tfp").cast("double") / 10000.0, 4).as("revenue"),
        expr("CAST(pfp AS DECIMAL(38,0)) * 1000000 div nullif(CAST(tfp AS DECIMAL(38,0)), 0)")
          .as("promo_ppm"),
        col("n_items"))
  }

  def promoRevenueShareSql: String = {
    val disc = "l_extendedprice * (1.0 - l_discount)"
    val promo = s"CASE WHEN p_type = 'PROMO' THEN $disc ELSE 0.0 END"
    s"""SELECT ship_month,
       |       round(CAST(pfp AS DOUBLE) / 10000.0, 4) AS promo_revenue,
       |       round(CAST(tfp AS DOUBLE) / 10000.0, 4) AS revenue,
       |       CAST(CAST(pfp AS HUGEINT) * 1000000 //
       |            nullif(CAST(tfp AS HUGEINT), 0) AS BIGINT) AS promo_ppm,
       |       n_items
       |FROM (
       |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       |         ${FixedPoint.sum4UnitsSql(promo)} AS pfp,
       |         ${FixedPoint.sum4UnitsSql(disc)} AS tfp,
       |         count(*) AS n_items
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1)""".stripMargin
  }

  /** Top-N customers by spend (deterministic: rounded spend + key). */
  def topCustomers(orders: DataFrame, customer: DataFrame, n: Int = 10): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(FixedPoint.sum4(col("o_totalprice")).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(n)

  def topCustomersSql(n: Int = 10): String =
    s"""SELECT c_custkey, c_name,
       |       round(CAST(sum(CAST(round((o_totalprice) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS total_spend,
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

  /** TPC-H Q5 shape — regional supplier revenue: the 6-table join that
    * exercises real join planning. One fact-fact shuffle join
    * (lineitem ⋈ orders, both sides hash on orderkey — the only
    * unavoidable exchange pair) with every dimension broadcast, the
    * region/date filters pushed below the joins, and the nation-match
    * predicate (customer's nation = supplier's nation) applied as a
    * cheap post-join filter. At 100 TB the same plan holds: dims stay
    * ≪ broadcast threshold, and AQE picks the fact-fact strategy from
    * runtime sizes. */
  def regionalRevenue(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame,
                      regionName: String = "ASIA",
                      yearStart: String = "1995-01-01",
                      yearEnd: String = "1996-01-01"): DataFrame = {
    val natInRegion = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val ordersInYear = orders.filter(
      col("o_orderdate") >= lit(yearStart).cast("timestamp") &&
        col("o_orderdate") < lit(yearEnd).cast("timestamp"))
    lineitem
      .join(ordersInYear, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(natInRegion), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(FixedPoint.sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  def regionalRevenueSql(regionName: String = "ASIA",
                         yearStart: String = "1995-01-01",
                         yearEnd: String = "1996-01-01"): String =
    s"""SELECT n_name,
       |       round(CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation   ON s_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |WHERE r_name = '$regionName'
       |  AND c_nationkey = s_nationkey
       |  AND o_orderdate >= TIMESTAMP '$yearStart'
       |  AND o_orderdate <  TIMESTAMP '$yearEnd'
       |GROUP BY n_name""".stripMargin

  /** Referential-integrity audit: orphan counts per foreign key — the
    * post-load constraint check a warehouse runs on every batch (anti
    * joins; the dim side builds the hash table, orphans stream). */
  def integrityAudit(orders: DataFrame, customer: DataFrame,
                     lineitem: DataFrame): DataFrame = {
    val o = orders.join(customer, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit("orders_custkey").as("fk"), col("n_orphans"))
    val l = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit("lineitem_orderkey").as("fk"), col("n_orphans"))
    o.unionAll(l)
  }

  def integrityAuditSql: String =
    """SELECT 'orders_custkey' AS fk, count(*) AS n_orphans FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'lineitem_orderkey', count(*) FROM lineitem l
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin

  /** Fixed-width histogram of order totals: integer bucket arithmetic
    * (floor of value/width), counts + per-bucket revenue mass. The
    * single-shuffle shape every BI "distribution" panel compiles to. */
  def priceHistogram(orders: DataFrame, width: Double = 25000.0): DataFrame =
    orders
      .groupBy(floor(col("o_totalprice") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))

  def priceHistogramSql(width: Double = 25000.0): String =
    s"""SELECT CAST(floor(o_totalprice / $width) AS BIGINT) AS bucket,
       |       count(*) AS n,
       |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
       |FROM orders GROUP BY 1""".stripMargin

  /** GROUPING SETS: per (status), per (priority), and grand total in
    * one pass — one Expand (×3) + a single partial/final aggregate,
    * not three scans. grouping_id() disambiguates the null-key rows
    * from genuine NULL group values. */
  def orderGroupingSets(orders: DataFrame): DataFrame =
    orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))

  def orderGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin
}
