package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration weighted PageRank over the customer↔supplier
  * bipartite graph (orders ⋈ lineitem: who buys from whom, edge weight
  * = lineitem count, both directions) — the graph-centrality signal a
  * curation pipeline uses to weight sources (CommonCrawl-style domain
  * ranking) and an analytics engine uses for entity importance. The
  * reference has no graph operator; this extends §2 per the brief's
  * training-data-pipeline mandate.
  *
  * All arithmetic is scaled-integer (rank in units of `scale` = 10¹²,
  * damping as a percentage, per-edge contribution `pr·w div out_w`
  * truncated BEFORE the sum): identical operation order in Spark and
  * DuckDB, so the result is bit-exact and hash-matched — no float
  * summation-order hazard across 5 iterations. Truncation leaks a few
  * units of mass per edge per iteration (bounded by |E|·iters, ~10⁻⁶
  * of total at 10¹² scale) — deterministic, identical in both engines,
  * and irrelevant to ranking order.
  *
  * Scale shape: the edge list is built once (one orders⋈lineitem
  * shuffle), materialized, and never re-shuffled; every iteration is
  * edges ⋈ broadcast(ranks) + one groupBy(dst). The rank table is one
  * row per NODE — million-node graphs broadcast in MBs while the
  * billion-row EDGE table stays partitioned in place, which is the
  * iteration shape that survives 100 TB (Pregel's insight, expressed
  * relationally). Driver work is one bounded count (|V|).
  */
object PageRank {

  /** The checkpointed (edges, nodes) pair for the customer↔supplier
    * graph. Edges are consumed once per iteration — materialize once,
    * the measured "consumed >1×" rule (bipartite both-direction edges
    * also mean no dangling nodes: every node with an in-edge has an
    * out-edge, no leaked mass term). */
  private def buildGraph(orders: DataFrame,
                         lineitem: DataFrame): (DataFrame, DataFrame) =
    graphFromPairs(weightedPairs(orders, lineitem))

  /** The (customer, supplier, weight) edge aggregate the graph is built
    * from — also the unit the STREAMING leg accumulates per micro-batch
    * (weights are counts, a monoid: per-batch deltas summed at refresh
    * time equal this batch aggregate exactly). */
  def weightedPairs(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("w"))

  private def graphFromPairs(pairs: DataFrame): (DataFrame, DataFrame) = {
    val fwd = pairs.select(concat(lit("c:"), col("c")).as("src"),
      concat(lit("s:"), col("s")).as("dst"), col("w"))
    val rev = pairs.select(concat(lit("s:"), col("s")).as("src"),
      concat(lit("c:"), col("c")).as("dst"), col("w"))
    val und = fwd.unionAll(rev)
    val outw = und.groupBy("src").agg(sum("w").as("ow"))
    val edges = und.join(outw, "src").localCheckpoint()
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint()
    (edges, nodes)
  }

  /** The shared damped recurrence: r' = teleport + d·Σ contrib, with
    * caller-supplied init and per-iteration teleport columns (global
    * rank spreads both uniformly; personalized rank concentrates both
    * on the seed). The iteration chain stays LAZY: no action fires
    * until the caller's, so the whole recurrence is ONE DAG in which
    * each iteration's subtree executes exactly once (no O(iters²)
    * re-derivation — only the EDGE frame needed pinning, it appears in
    * every iteration's join). Checkpointing per iteration was measured
    * slower (3.5 → 3.8 s at sf0.1): four extra materialization
    * barriers for lineage nothing re-reads. At iters ≫ 10 truncate
    * every ~10 rounds to keep Catalyst's analysis of the growing plan
    * cheap.
    *
    * `broadcastRanks` is the size gate (same hybrid shape as
    * `Clusters.connectedComponents`): below the node threshold the rank
    * table ships as a broadcast (MBs for million-node graphs — one
    * exchange-free map join per iteration); above it the hint is
    * dropped and the join runs as a shuffle join against the edge
    * table, whose `buildGraph` partitioning on `src` is exactly the
    * join key — only the (small) rank side moves. Billion-node graphs
    * make the rank table GBs; 5 iterations of a GB broadcast is the
    * plan that dies at scale, the shuffle join is the one that
    * survives. Both paths run the identical integer arithmetic, so the
    * output is bit-equal (spec-asserted). */
  private def iterate(edges: DataFrame, nodes: DataFrame,
                      init: org.apache.spark.sql.Column,
                      teleport: org.apache.spark.sql.Column,
                      iters: Int, dampingPct: Int,
                      broadcastRanks: Boolean): DataFrame = {
    var ranks = nodes.select(col("node"), init.as("pr"))
    for (_ <- 1 to iters) {
      val rankSide = if (broadcastRanks) broadcast(ranks) else ranks
      // The contribution aggregate's key set IS the node set: the graph
      // is both-direction by construction ([[graphFromPairs]] emits
      // every pair reversed), so every node has an in-edge, and the
      // rank table inductively covers all nodes — the join drops no
      // edge. The rank update therefore reads straight off the
      // aggregate (distinct dst = nodes, cs never null), deleting the
      // per-iteration nodes ⋈ contrib join the previous shape used to
      // re-attach zero-contribution nodes that cannot exist here
      // (r17; spec-pinned against the unrolled-CTE oracle, which keeps
      // the LEFT JOIN form — equal outputs prove the no-dangling-nodes
      // invariant each run).
      ranks = edges.join(rankSide, col("src") === col("node"))
        .select(col("dst"), expr("pr * w div ow").as("cb"))
        .groupBy("dst").agg(sum("cb").as("cs"))
        .select(col("dst").as("node"), col("cs"))
        .select(col("node"),
          (teleport + expr(s"($dampingPct * cs) div 100")).as("pr"))
    }
    ranks
  }

  /** Node-count gate for the rank broadcast, MEASURED down from the
    * 10⁷ design guess (ScaleSoak r9, warmed JIT, 3 iterations,
    * local[32]): because [[buildGraph]] pre-partitions the edge table
    * on `src`, the "shuffle" join only exchanges the rank table — so
    * the broadcast path never actually wins on the measured host
    * (1.52 vs 1.77 s at 3·10⁴ nodes, 4.7 vs 6.6 s at 10⁶) and loses
    * 2-4.5× past 4·10⁶ (12.5 vs 25.6 s at 4M; 12.2 vs 54.9 at 10M;
    * 23.9 vs 62.4 at 20M) where per-iteration hashmap construction +
    * GC dominate. The gate keeps broadcast only where its measured
    * cost is negligible — ≤10% at ≤3·10⁵ nodes, which is exactly
    * where the constant sits — because there a real cluster's
    * per-iteration exchange latency still argues for it; beyond that
    * band the measured penalty grows to 40% at 10⁶ and 2-4.5× past
    * 4·10⁶ (N-row hashmap built ≥ iters times — substrate-independent
    * arithmetic), so the shuffle path takes over. Full table in
    * SCALING.md. Overridable per call so specs can force either
    * path. */
  val DefaultBroadcastMaxNodes: Long = 300000L

  /** (node, pr) after `iters` damped iterations; node is namespaced
    * ("c:<custkey>" / "s:<suppkey>"), pr is in units of 1/`scale`. */
  def supplierRank(orders: DataFrame, lineitem: DataFrame,
                   iters: Int = 5, scale: Long = 1000000000000L,
                   dampingPct: Int = 85,
                   broadcastMaxNodes: Long = DefaultBroadcastMaxNodes): DataFrame =
    rankFromPairs(weightedPairs(orders, lineitem), iters, scale,
      dampingPct, broadcastMaxNodes)

  /** [[supplierRank]] from an already-aggregated (c, s, w) pair table —
    * the entry the streaming leg refreshes through (its edge state IS
    * this aggregate, maintained incrementally); identical plan from the
    * pair table onward, so batch and streaming ranks are bit-equal. */
  def rankFromPairs(pairs: DataFrame,
                    iters: Int = 5, scale: Long = 1000000000000L,
                    dampingPct: Int = 85,
                    broadcastMaxNodes: Long = DefaultBroadcastMaxNodes): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val (edges, nodes) = graphFromPairs(pairs)
    val n = nodes.count() // bounded driver action: |V|
    val r0 = scale / n
    val baseTerm = r0 * (100 - dampingPct) / 100
    iterate(edges, nodes, lit(r0), lit(baseTerm), iters, dampingPct,
      broadcastRanks = n <= broadcastMaxNodes)
  }

  /** Personalized PageRank: the teleport mass lands ONLY on the seed
    * node, so rank measures proximity TO THE SEED through the weighted
    * graph — the graph-native "related entities" retrieval primitive
    * (recommendations, related-suppliers-of-a-customer). Same integer
    * recurrence, same edge/broadcast iteration shape; only the init
    * and teleport columns change, which is the PPR definition. */
  /** Node-id shape every seed must satisfy — also what makes the SQL
    * twin's string literal injection-proof (no quotes can appear). */
  private val SeedShape = "[cs]:[0-9]+".r

  def personalizedRank(orders: DataFrame, lineitem: DataFrame,
                       seed: String = "", iters: Int = 5,
                       scale: Long = 1000000000000L,
                       dampingPct: Int = 85,
                       broadcastMaxNodes: Long = DefaultBroadcastMaxNodes): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    require(seed.isEmpty || SeedShape.matches(seed),
      s"seed must match ${SeedShape.regex}: '$seed'")
    // empty seed = the minimum ordering customer — guaranteed a graph
    // node at every scale factor (a literal custkey might not order).
    // Bounded driver action (one min), same value the SQL twin's
    // scalar subquery resolves. cast + isNullAt: survives a testdata
    // regeneration that ships o_custkey as INT32 (events.ts already
    // changed physical type once) and an empty orders table.
    val seedNode = if (seed.nonEmpty) seed else {
      val row = orders.agg(min(col("o_custkey")).cast("long")).head
      require(!row.isNullAt(0), "personalizedRank: orders is empty, no default seed")
      "c:" + row.getLong(0)
    }
    val (edges, nodes) = buildGraph(orders, lineitem)
    val n = nodes.count() // bounded driver action: |V|
    val baseTerm = scale * (100 - dampingPct) / 100
    val init = when(col("node") === seedNode, lit(scale)).otherwise(lit(0L))
    val tp = when(col("node") === seedNode, lit(baseTerm)).otherwise(lit(0L))
    iterate(edges, nodes, init, tp, iters, dampingPct,
      broadcastRanks = n <= broadcastMaxNodes)
  }

  /** DuckDB twin: the same integer recurrence with the iterations
    * unrolled as CTEs r1..rN (generated, like every SQL builder here —
    * DuckDB's recursive CTEs disallow the aggregate the contribution
    * sum needs). `//` on positive BIGINTs is the same truncation as
    * Spark's `div`; the final CAST pins BIGINT against DuckDB's
    * HUGEINT sum widening. */
  def supplierRankSql(iters: Int = 5, scale: Long = 1000000000000L,
                      dampingPct: Int = 85): String = {
    val base =
      s"""WITH pairs AS (
         |  SELECT o_custkey AS c, l_suppkey AS s, count(*) AS w
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |und AS (
         |  SELECT 'c:' || c AS src, 's:' || s AS dst, w FROM pairs
         |  UNION ALL
         |  SELECT 's:' || s, 'c:' || c, w FROM pairs),
         |outw AS (SELECT src, sum(w) AS ow FROM und GROUP BY 1),
         |e AS (SELECT und.src, und.dst, und.w, outw.ow
         |      FROM und JOIN outw ON outw.src = und.src),
         |nodes AS (SELECT DISTINCT src AS node FROM und),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, (SELECT $scale // n FROM nn) AS pr
         |       FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node, CAST(
         |      (SELECT ($scale // n) * ${100 - dampingPct} // 100 FROM nn)
         |      + ($dampingPct * coalesce(sum((r.pr * e.w) // e.ow), 0)) // 100
         |    AS BIGINT) AS pr
         |  FROM nodes n
         |  LEFT JOIN e ON e.dst = n.node
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY n.node)""".stripMargin
    }
    (base +: iterCtes).mkString(",\n") +
      s"\nSELECT node, pr FROM r$iters"
  }

  /** DuckDB twin of [[personalizedRank]]: identical graph CTEs, seed-
    * conditional init and teleport (the PPR delta, nothing else). */
  def personalizedRankSql(seed: String = "", iters: Int = 5,
                          scale: Long = 1000000000000L,
                          dampingPct: Int = 85): String = {
    // same shape gate as the Spark twin: a seed that can't contain a
    // quote can't malform (or inject into) the interpolated literal,
    // and an off-shape seed fails loudly HERE instead of silently
    // diverging between engines.
    require(seed.isEmpty || SeedShape.matches(seed),
      s"seed must match ${SeedShape.regex}: '$seed'")
    val baseTerm = scale * (100 - dampingPct) / 100
    val seedExpr = if (seed.nonEmpty) s"'$seed'"
      else "('c:' || (SELECT min(o_custkey) FROM orders))"
    val base =
      s"""WITH pairs AS (
         |  SELECT o_custkey AS c, l_suppkey AS s, count(*) AS w
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |und AS (
         |  SELECT 'c:' || c AS src, 's:' || s AS dst, w FROM pairs
         |  UNION ALL
         |  SELECT 's:' || s, 'c:' || c, w FROM pairs),
         |outw AS (SELECT src, sum(w) AS ow FROM und GROUP BY 1),
         |e AS (SELECT und.src, und.dst, und.w, outw.ow
         |      FROM und JOIN outw ON outw.src = und.src),
         |nodes AS (SELECT DISTINCT src AS node FROM und),
         |r0 AS (SELECT node,
         |         CAST(CASE WHEN node = $seedExpr THEN $scale ELSE 0 END
         |           AS BIGINT) AS pr
         |       FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.node, CAST(
         |      CASE WHEN n.node = $seedExpr THEN $baseTerm ELSE 0 END
         |      + ($dampingPct * coalesce(sum((r.pr * e.w) // e.ow), 0)) // 100
         |    AS BIGINT) AS pr
         |  FROM nodes n
         |  LEFT JOIN e ON e.dst = n.node
         |  LEFT JOIN r${i - 1} r ON r.node = e.src
         |  GROUP BY n.node)""".stripMargin
    }
    (base +: iterCtes).mkString(",\n") +
      s"\nSELECT node, pr FROM r$iters"
  }
}
