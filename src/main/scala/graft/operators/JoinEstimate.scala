package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CMS
import graft.functions.CmsFunctions.{cm_inner, cm_sketch}

/** Pre-join cardinality estimation from Count-Min sketches — the
  * planner-side use of the sketch family: |A ⋈ B| on a key is the
  * inner product of the two key-frequency vectors, and the CM estimate
  * of that inner product needs one ~32 kB sketch per side. At 100 TB
  * this is how a pipeline decides a join strategy BEFORE paying for
  * the join: estimate the output size (and, with `cm_estimate` point
  * queries, per-key skew) from sketches collected during ingest or a
  * prior pass — no shuffle, no sampling scan; the sketch scan is
  * map-side partial-aggregated into a single 32 kB row per side.
  *
  * The estimate is deterministically ≥ the true size (hash collisions
  * only add mass) and the overcount is bounded by the collision mass
  * ≈ n_left·n_right/W per row before the row-wise min; q_joinsize_bounds
  * pins both inequalities as an oracle-checked gate, the
  * q_approx_bounds discipline for sketch outputs.
  */
object JoinEstimate {

  /** Join-size estimate for `a ⋈ b` on (aKey = bKey): two 1-row sketch
    * aggregates crossed into one `cm_inner`. */
  def estimateJoinSize(a: DataFrame, aKey: String,
                       b: DataFrame, bKey: String): DataFrame =
    a.agg(cm_sketch(col(aKey)).as("sk_a"))
      .crossJoin(b.agg(cm_sketch(col(bKey)).as("sk_b")))
      .select(cm_inner(col("sk_a"), col("sk_b")).as("est_size"))

  /** Oracle gate over named join pairs: for each, the exact size (from
    * the per-key count join — the thing production never runs; it is
    * here precisely to check the estimate), the input cardinalities,
    * and the two CM guarantees as a boolean:
    * exact ≤ est ≤ exact + 3·n_left·n_right/W. */
  def joinBounds(pairs: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    pairs.map { case (name, a, aKey, b, bKey) =>
      val ska = a.agg(cm_sketch(col(aKey)).as("sk_a"),
        count(lit(1)).as("n_left"))
      val skb = b.agg(cm_sketch(col(bKey)).as("sk_b"),
        count(lit(1)).as("n_right"))
      val exact = a.select(col(aKey).as("k")).groupBy("k")
        .agg(count(lit(1)).as("ca"))
        .join(b.select(col(bKey).as("k")).groupBy("k")
          .agg(count(lit(1)).as("cb")), "k")
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_size"))
      val est = cm_inner(col("sk_a"), col("sk_b"))
      ska.crossJoin(skb).crossJoin(exact)
        .select(lit(name).as("join_name"), col("n_left"), col("n_right"),
          col("exact_size"),
          (est >= col("exact_size") && est <= col("exact_size") +
            lit(3.0) * col("n_left") * col("n_right") / lit(CMS.W.toDouble))
            .as("est_ok"))
    }.reduce(_ unionByName _)

  /** The fixture pairs for q_joinsize_bounds: three FK joins across
    * the star schema plus one self-join (Σ cnt² — the classic second
    * frequency moment the sketch also answers). */
  def starJoinBounds(orders: DataFrame, customer: DataFrame,
                     lineitem: DataFrame, part: DataFrame): DataFrame =
    joinBounds(Seq(
      ("lineitem_orders", lineitem, "l_orderkey", orders, "o_orderkey"),
      ("lineitem_part", lineitem, "l_partkey", part, "p_partkey"),
      ("orders_customer", orders, "o_custkey", customer, "c_custkey"),
      ("orders_self_custkey", orders, "o_custkey", orders, "o_custkey")))

  def starJoinBoundsSql: String =
    s"""SELECT 'lineitem_orders' AS join_name,
       |       (SELECT count(*) FROM lineitem) AS n_left,
       |       (SELECT count(*) FROM orders) AS n_right,
       |       (SELECT count(*) FROM lineitem JOIN orders
       |        ON l_orderkey = o_orderkey) AS exact_size,
       |       true AS est_ok
       |UNION ALL
       |SELECT 'lineitem_part',
       |       (SELECT count(*) FROM lineitem),
       |       (SELECT count(*) FROM part),
       |       (SELECT count(*) FROM lineitem JOIN part
       |        ON l_partkey = p_partkey),
       |       true
       |UNION ALL
       |SELECT 'orders_customer',
       |       (SELECT count(*) FROM orders),
       |       (SELECT count(*) FROM customer),
       |       (SELECT count(*) FROM orders JOIN customer
       |        ON o_custkey = c_custkey),
       |       true
       |UNION ALL
       |SELECT 'orders_self_custkey',
       |       (SELECT count(*) FROM orders),
       |       (SELECT count(*) FROM orders),
       |       (SELECT CAST(sum(c * c) AS BIGINT) FROM
       |        (SELECT count(*) AS c FROM orders GROUP BY o_custkey)),
       |       true""".stripMargin
}
