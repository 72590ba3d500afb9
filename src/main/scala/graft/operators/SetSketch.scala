package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Segment set-algebra from theta sketches ([[graft.functions.Theta]])
  * — "how many users did A and B / A but not B", answered from ~2 kB
  * per-segment sketches instead of a second pass over raw events, with
  * the exact twin columns alongside as the measured error gate (the
  * q_approx_bounds pattern).
  *
  * Sketches build per (day, type) and [[graft.functions.ThetaFunctions
  * .theta_merge]] to one per type — the rollup shape the sketch store
  * persists — then a tiny post-aggregate pair join (|types|² rows, the
  * windowMixDrift dense-grid class) evaluates union / intersection /
  * difference per pair from sketch state alone.
  *
  * Scale shape: the corpus sees ONE distinct-project and the sketch
  * aggregate (both partial-aggregable); everything pairwise runs on
  * |types| rows of 2 kB state. The exact legs here exist to GRADE the
  * estimates and stay cheap at test SF; at 100 TB a user drops them
  * and keeps the sketch half — that asymmetry is the operator's point.
  *
  * Oracle: bottom-K is a semilattice, so the per-day sketch step drops
  * out of the SQL twin (the q_quantile_rollup argument) — DuckDB
  * recomputes each type's K smallest md5 draws directly, then replays
  * the same integer estimator (HUGEINT ⌊(K−1)·2⁶³/θ⌋) the engine
  * computes with BigInt: estimates match bit-for-bit, not
  * approximately.
  */
object SetSketch {
  import graft.functions.ThetaFunctions._

  private val K = graft.functions.Theta.K

  /** One row per unordered event-type pair: theta union / intersection
    * / A-not-B estimates plus their exact twins. */
  def thetaSets(events: DataFrame): DataFrame = {
    val sk = events
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(theta_sketch_r(col("user_id")).as("dsk"))
      .groupBy(col("event_type"))
      .agg(theta_merge(col("dsk")).as("sk"))
      .localCheckpoint() // |types| rows of sketch state, consumed twice
    val pairs = sk.as("a")
      .join(broadcast(sk.as("b")), col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        theta_union_est(col("a.sk"), col("b.sk")).as("union_est"),
        theta_intersect_est(col("a.sk"), col("b.sk")).as("inter_est"),
        theta_anotb_est(col("a.sk"), col("b.sk")).as("anotb_est"))
    // exact twins: one distinct-project, per-type counts + pair overlap
    val tu = events.select(col("event_type"), col("user_id")).distinct()
      .localCheckpoint()
    val cnt = tu.groupBy(col("event_type")).agg(count(lit(1)).as("cu"))
    val overlap = tu.as("x")
      .join(tu.as("y"), col("x.user_id") === col("y.user_id") &&
        col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    pairs
      .join(broadcast(cnt.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("cu", "cu_a")), "type_a")
      .join(broadcast(cnt.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("cu", "cu_b")), "type_b")
      .join(broadcast(overlap), Seq("type_a", "type_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .select(col("type_a"), col("type_b"),
        col("union_est"), col("inter_est"), col("anotb_est"),
        (col("cu_a") + col("cu_b") - col("exact_inter")).as("exact_union"),
        col("exact_inter"),
        (col("cu_a") - col("exact_inter")).as("exact_anotb"))
  }

  /** DuckDB twin of [[thetaSets]] — same bottom-K retained sets, same
    * HUGEINT estimator, same exact legs. */
  def thetaSetsSql: String = {
    val S = "9223372036854775808::HUGEINT" // 2^63, the 63-bit hash space
    s"""WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
       |hs AS (
       |  SELECT DISTINCT event_type,
       |         (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
       |          >> 1)::BIGINT AS h
       |  FROM tu),
       |sk AS (
       |  SELECT event_type, h FROM (
       |    SELECT event_type, h,
       |           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |    FROM hs) WHERE rn <= $K),
       |eff AS (
       |  SELECT event_type, n,
       |         CASE WHEN n >= $K THEN mx::HUGEINT ELSE $S END AS theta
       |  FROM (SELECT event_type, count(*) AS n, max(h) AS mx
       |        FROM sk GROUP BY 1)),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b,
       |         least(a.theta, b.theta) AS theta_u
       |  FROM eff a JOIN eff b ON a.event_type < b.event_type),
       |usk AS (
       |  SELECT type_a, type_b, h FROM (
       |    SELECT type_a, type_b, h,
       |           row_number() OVER (PARTITION BY type_a, type_b
       |                              ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT p.type_a, p.type_b, s.h
       |          FROM pairs p
       |          JOIN sk s ON s.event_type IN (p.type_a, p.type_b)))
       |  WHERE rn <= $K),
       |uest AS (
       |  SELECT type_a, type_b,
       |         CASE WHEN n < $K THEN n::HUGEINT
       |              ELSE (${K - 1}::HUGEINT * $S) // mx::HUGEINT END AS union_est
       |  FROM (SELECT type_a, type_b, count(*) AS n, max(h) AS mx
       |        FROM usk GROUP BY 1, 2)),
       |ic AS (
       |  SELECT p.type_a, p.type_b,
       |         count(a.h) FILTER (WHERE bh.h IS NOT NULL) AS c_inter,
       |         count(a.h) FILTER (WHERE a.h IS NOT NULL AND bh.h IS NULL)
       |           AS c_anotb
       |  FROM pairs p
       |  LEFT JOIN sk a ON a.event_type = p.type_a
       |                AND a.h::HUGEINT < p.theta_u
       |  LEFT JOIN sk bh ON bh.event_type = p.type_b AND bh.h = a.h
       |  GROUP BY 1, 2),
       |iest AS (
       |  SELECT p.type_a, p.type_b,
       |         CASE WHEN p.theta_u = $S THEN ic.c_inter::HUGEINT
       |              ELSE (ic.c_inter::HUGEINT * $S) // p.theta_u END AS inter_est,
       |         CASE WHEN p.theta_u = $S THEN ic.c_anotb::HUGEINT
       |              ELSE (ic.c_anotb::HUGEINT * $S) // p.theta_u END AS anotb_est
       |  FROM pairs p JOIN ic USING (type_a, type_b)),
       |cnt AS (SELECT event_type, count(*) AS cu FROM tu GROUP BY 1),
       |xin AS (
       |  SELECT x.event_type AS type_a, y.event_type AS type_b,
       |         count(*) AS exact_inter
       |  FROM tu x JOIN tu y ON x.user_id = y.user_id
       |                     AND x.event_type < y.event_type
       |  GROUP BY 1, 2)
       |SELECT p.type_a, p.type_b,
       |       CAST(u.union_est AS BIGINT) AS union_est,
       |       CAST(i.inter_est AS BIGINT) AS inter_est,
       |       CAST(i.anotb_est AS BIGINT) AS anotb_est,
       |       ca.cu + cb.cu - coalesce(x.exact_inter, 0) AS exact_union,
       |       coalesce(x.exact_inter, 0) AS exact_inter,
       |       ca.cu - coalesce(x.exact_inter, 0) AS exact_anotb
       |FROM pairs p
       |JOIN uest u USING (type_a, type_b)
       |JOIN iest i USING (type_a, type_b)
       |JOIN cnt ca ON ca.event_type = p.type_a
       |JOIN cnt cb ON cb.event_type = p.type_b
       |LEFT JOIN xin x ON x.type_a = p.type_a AND x.type_b = p.type_b""".stripMargin
  }
}
