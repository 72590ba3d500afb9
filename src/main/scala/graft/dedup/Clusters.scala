package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster assembly: connected components over candidate
  * pairs, so "A≈B, B≈C" collapses into one keep-group even when A and C
  * never collide directly — the step a real corpus-dedup pipeline runs
  * between LSH candidate generation and document dropping (keep the
  * cluster minimum, drop the rest).
  *
  * Algorithm: iterative min-label propagation. labels(n) starts at n;
  * each round takes the min label across neighbors; converged when no
  * label changes. Rounds = graph diameter, and LSH duplicate clusters
  * are near-cliques (diameter 2-3), so 3-4 rounds is typical. Each
  * round is one shuffle-join + one aggregate; `localCheckpoint` cuts
  * the growing lineage so round N's plan doesn't replay rounds 1..N-1.
  * At 1000-executor scale the same loop holds (labels and edges are
  * both (long, long) tables — tiny relative to the corpus); for
  * adversarial high-diameter graphs the alternating large-star /
  * small-star variant (Kiveris et al., MapReduce CC) drops rounds to
  * O(log d) with the same per-round join shape.
  */
object Clusters {

  /** Edge count below which the graph goes through a driver union-find
    * instead of iterative Spark jobs. LSH candidate graphs are tiny
    * relative to the corpus that produced them (pairs ≈ near-dup
    * collisions, not documents), and union-find finishes in
    * milliseconds where every distributed label round costs a join +
    * aggregate job. Above the threshold the distributed loop runs;
    * identical results, spec-asserted on both paths.
    *
    * Threshold MEASURED, not assumed (ScaleSoak r9, near-clique
    * candidate graphs, warmed JIT, local[32]): union-find wins at
    * 500k edges (2.5 vs 2.9 s), loses from 1M up (3.9 vs 2.1 s at 1M)
    * and degrades superlinearly once the collect's row boxing starts
    * GC-thrashing the driver (34 s at 4M, 80 s at 8M vs the loop's
    * flat 5-10 s). The crossover therefore lies strictly between 500k
    * and 1M; the gate sits at 500k — the LAST measured size where
    * union-find won — so the unmeasured half of the band routes to
    * the path whose cost curve is flat, not the one that degrades.
    * On a real cluster the collect also crosses the network, moving
    * the crossover LOWER, never higher; full table in SCALING.md.
    * Revised down from the 2M design guess. */
  val smallGraphEdges: Long = 500000L

  /** Driver union-find (path halving + union-by-min): one collect of
    * the edge list, min-root labels, one parallelize back. */
  private def unionFind(p: DataFrame): DataFrame = {
    val spark = p.sparkSession
    val edges = p.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var px = parent.getOrDefault(x, x)
      while (px != x) { // path halving
        val ppx = parent.getOrDefault(px, px)
        parent.put(x, ppx); x = ppx; px = parent.getOrDefault(x, x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by min: root IS the component minimum
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
      if (!parent.containsKey(a)) parent.put(a, find(a))
      if (!parent.containsKey(b)) parent.put(b, find(b))
    }
    import scala.jdk.CollectionConverters._
    val out = parent.keySet().asScala.toSeq.map(n => (n, find(n)))
    import spark.implicits._
    out.toDF("doc_id", "cluster_id")
  }

  /** (doc_id, cluster_id) for every doc that appears in `pairs`
    * (a_id/b_id columns); cluster_id = min doc_id of the component.
    * @param smallGraphThreshold override for tests (0 forces the
    *   distributed loop) */
  def connectedComponents(pairs: DataFrame,
                          smallGraphThreshold: Long = smallGraphEdges): DataFrame = {
    // materialize the pair pipeline ONCE before fanning into two union
    // branches (each union branch would otherwise re-run the full
    // upstream plan — for LSH candidates that is the whole
    // shingle/signature/band pipeline, twice)
    val p = pairs.select(col("a_id"), col("b_id")).localCheckpoint()
    // size the loop's shuffle width from the actual edge count (p is
    // already materialized, so the count is free): the label tables are
    // (long, long) rows, orders of magnitude smaller than the corpus
    // that produced the pairs, and running a 10k-edge graph through
    // 32-way exchanges is pure scheduling overhead. ~1M edges/partition
    // keeps partitions comfortably in memory at any scale.
    val conf = pairs.sparkSession.sessionState.conf.numShufflePartitions
    val nEdges = p.count()
    if (nEdges <= smallGraphThreshold) return unionFind(p)
    val nPart = math.max(1L, math.min(conf.toLong, nEdges / 1000000L + 1L)).toInt
    // pre-partition the edge table on the join key: localCheckpoint
    // preserves the hash partitioning in LogicalRDD, so every round's
    // join shuffles only the (much smaller) labels side
    val edges = p.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionAll(p.select(col("b_id").as("src"), col("a_id").as("dst")))
      .repartition(nPart, col("src"))
      .localCheckpoint() // every round re-reads it
    // fused first round: label₀(n) = min(n, min neighbor). The groupBy
    // runs on the edge table's existing src-partitioning — no shuffle,
    // no join — and equals one full propagate round from the identity
    // labeling, so the loop below starts at round 2.
    var labels = edges.groupBy(col("src").as("node"))
      .agg(least(col("node"), min(col("dst"))).as("label"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // one round = propagate labels across edges, then self-union and
      // take the per-node min: 2 shuffles (join + groupBy), versus the
      // naive join + groupBy + left-join's 3. The self rows smuggle the
      // previous label through the aggregate (`own` is MaxValue on
      // propagated rows), so convergence detection is a cheap sum over
      // the already-checkpointed result instead of a second join.
      val prop = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("label"),
          lit(Long.MaxValue).as("own"))
      val next = prop
        .unionAll(labels.select(col("node"), col("label"),
          col("label").as("own")))
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), min(col("own")).as("old"))
        .withColumn("chg", (col("label") < col("old")).cast("long"))
        .localCheckpoint()
      changed = next.agg(sum(col("chg"))).head().getLong(0)
      labels = next.select(col("node"), col("label"))
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    * the high-diameter scale path. Min-label propagation moves a label
    * ONE hop per round (rounds = graph diameter); the star operations
    * rewire the edge set itself toward the component minimum, converging
    * in O(log d) rounds with the same join+aggregate per-round shape:
    *
    *  - large-star(c): every neighbor LARGER than c re-attaches to
    *    min(N(c) ∪ {c}) — long chains contract toward small labels;
    *  - small-star(c): c and its SMALLER neighbors all attach to their
    *    minimum — locally canonicalizes into stars.
    *
    * Both preserve connectivity exactly (no approximation); at the fixed
    * point every component is a star rooted at its minimum id, which is
    * precisely the (doc_id, cluster_id) output contract. LSH candidate
    * graphs are near-cliques where min-label already converges in 3-4
    * rounds; this variant exists for adversarially chained graphs (e.g.
    * near-dup "drift" chains A≈B≈C≈… across a crawl) where diameter can
    * reach hundreds. Same output as [[connectedComponents]],
    * spec-asserted equal on both shapes. */
  def connectedComponentsStar(pairs: DataFrame,
                              maxRounds: Int = 64): DataFrame =
    starRounds(pairs, maxRounds)._1

  /** [[connectedComponentsStar]] + the number of large+small rounds it
    * took to converge (exposed for specs/monitoring). */
  def starRounds(pairs: DataFrame, maxRounds: Int = 64): (DataFrame, Int) = {
    // canonical undirected edge set: u < v, no self-loops, no dups
    var edges = pairs
      .select(least(col("a_id"), col("b_id")).as("u"),
        greatest(col("a_id"), col("b_id")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      // LARGE-STAR. Symmetrize so every node is a center once with its
      // full neighborhood; m = min(neighbors ∪ {center}); neighbors
      // strictly larger than the center re-attach to m. Edges (n, m)
      // come out already canonical (m ≤ c < n).
      val sym = edges.select(col("u").as("c"), col("v").as("n"))
        .unionAll(edges.select(col("v").as("c"), col("u").as("n")))
      val lmin = sym.groupBy(col("c"))
        .agg(least(min(col("n")), col("c")).as("m"))
      val large = sym.join(lmin, "c")
        .filter(col("n") > col("c"))
        .select(col("m").as("u"), col("n").as("v"))
        .filter(col("u") =!= col("v")).distinct().localCheckpoint()
      // SMALL-STAR on the canonical direction only: center = larger
      // endpoint, neighbors all smaller; center and neighbors attach to
      // the group minimum.
      val dir = large.select(col("v").as("c"), col("u").as("n"))
      val smin = dir.groupBy(col("c")).agg(min(col("n")).as("m"))
      val small = dir
        .unionAll(dir.select(col("c"), col("c").as("n")).distinct())
        .join(smin, "c")
        .filter(col("n") =!= col("m"))
        .select(col("m").as("u"), col("n").as("v"))
        .distinct().localCheckpoint()
      // fixed point: the round neither added nor removed an edge
      // (small ⊆ edges tested by anti join, sizes equal ⇒ sets equal)
      val grew = small.join(edges, Seq("u", "v"), "left_anti").count()
      done = grew == 0 && small.count() == edges.count()
      edges = small
      rounds += 1
    }
    // The label extraction below is only valid AT the fixed point (every
    // edge already (componentMin, member)); a maxRounds exit short of
    // convergence would silently mislabel. Fall back to min-label
    // propagation, which is exact regardless of round count.
    if (!done) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"starRounds hit maxRounds=$maxRounds before convergence; " +
          "falling back to min-label connectedComponents")
      return (connectedComponents(pairs), rounds)
    }
    // at the fixed point every edge is (componentMin, member): members
    // label directly, roots label themselves
    val labels = edges.select(col("v").as("doc_id"), col("u").as("cluster_id"))
      .unionAll(edges.select(col("u").as("doc_id"), col("u").as("cluster_id")).distinct())
      .distinct()
    (labels, rounds)
  }

  /** End-to-end: MinHash-LSH candidates at `minEstJaccard`, clustered.
    * @see [[Dedup.minhashCandidates]] */
  def dupClusters(docs: DataFrame, n: Int = 4,
                  minEstJaccard: Double = 0.5): DataFrame =
    connectedComponents(Dedup.minhashCandidates(docs, n, minEstJaccard))

  /** The end of the dedup pipeline: the corpus that SURVIVES
    * MinHash-LSH + clustering — every cluster keeps its minimum doc_id,
    * all other members drop. Anti join against the (tiny) drop list, so
    * the corpus scan streams map-side at any scale. */
  def survivors(docs: DataFrame, n: Int = 4,
                minEstJaccard: Double = 0.5): DataFrame = {
    val drop = dupClusters(docs, n, minEstJaccard)
      .filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
  }

  def survivorsSql(n: Int = 4, minEstJaccard: Double = 0.5): String =
    s"""SELECT d.doc_id, d.n_chars FROM documents d
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM (
       |${dupClustersSql(n, minEstJaccard)}
       |  ) c WHERE c.doc_id = d.doc_id AND c.doc_id <> c.cluster_id)""".stripMargin

  /** Quality-aware survivorship (the FineWeb-style policy): each
    * duplicate cluster keeps its HIGHEST-quality member — integer
    * per-mille [[graft.text.TextAnalysis.qualityExpr]] score, doc_id
    * tiebreak — instead of [[survivors]]' keep-the-min. Near-dup
    * crawls routinely pair a clean article with a boilerplate-wrapped
    * copy; min-id keeps whichever was crawled first, this keeps the
    * better one.
    *
    * Scale shape: the cluster table (near-dup members only — tiny
    * relative to the corpus) joins the quality scan, the argmax window
    * runs over those members only, and the corpus anti-joins the drop
    * list exactly as in [[survivors]] — the added policy never touches
    * non-duplicate rows. */
  /** The doc_ids quality-aware survivorship DROPS: every duplicate-
    * cluster member except its highest-quality one — tiny relative to
    * the corpus (near-dup members only). Exposed so composites
    * ([[graft.text.Curate.curateDocs]]) can anti-join it against their
    * own projection in ONE pass instead of anti-joining here and then
    * re-joining the corpus for the columns they carry. */
  def dropsBest(docs: DataFrame, n: Int = 4,
                minEstJaccard: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a curated input (Curate.curateDocs) already carries quality_pm —
    // reuse it instead of re-running the 7 scoring regexes over the
    // corpus a second time (measured on q_curate: the rescore was the
    // single biggest avoidable cost in the fused pipeline)
    val quality =
      if (docs.columns.contains("quality_pm"))
        docs.select(col("doc_id"), col("quality_pm"))
      else docs.select(col("doc_id"),
        graft.text.TextAnalysis.qualityExpr.as("quality_pm"))
    val members = dupClusters(docs, n, minEstJaccard)
      .join(quality, "doc_id")
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_pm").desc, col("doc_id"))
    members.withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1).select(col("doc_id"))
  }

  def survivorsBest(docs: DataFrame, n: Int = 4,
                    minEstJaccard: Double = 0.5): DataFrame =
    docs.join(dropsBest(docs, n, minEstJaccard), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))

  /** The survivorship CTE chain WITHOUT the leading WITH / final
    * select, so composites can prepend their own CTEs (e.g. a
    * `documents` CTE shadowing the base table — the curation
    * pipeline). All references to `documents` resolve to whatever is
    * in scope. */
  def survivorsBestCtes(n: Int = 4, minEstJaccard: Double = 0.5,
                        pairWhere: String = ""): String =
    s"""clusters AS MATERIALIZED (
       |${dupClustersSql(n, minEstJaccard, pairWhere)}
       |),
       |quality AS MATERIALIZED (
       |${graft.text.TextAnalysis.qualityScoreSql}
       |),
       |ranked AS MATERIALIZED (
       |  SELECT c.doc_id,
       |         row_number() OVER (PARTITION BY c.cluster_id
       |                            ORDER BY q.quality_pm DESC, c.doc_id) AS rn
       |  FROM clusters c JOIN quality q USING (doc_id)),
       |drops AS (SELECT doc_id FROM ranked WHERE rn > 1)""".stripMargin

  def survivorsBestSql(n: Int = 4, minEstJaccard: Double = 0.5): String =
    s"""WITH ${survivorsBestCtes(n, minEstJaccard)}
       |SELECT d.doc_id, d.n_chars FROM documents d
       |WHERE NOT EXISTS (SELECT 1 FROM drops x WHERE x.doc_id = d.doc_id)""".stripMargin

  /** DuckDB oracle: the same candidate SQL feeding a recursive-CTE
    * reachability walk; min reachable root = min component member.
    * `pairWhere` optionally restricts the edge set (e.g. a same-shard
    * predicate for the incremental-curation twin, where near-dup runs
    * within each arriving shard only). */
  /** Incremental connected-components refresh: fold a DELTA edge set
    * into an existing (doc_id, cluster_id) labeling without touching
    * the edges that produced it — the close-the-loop operator for the
    * ingestion pipeline's deferred cross-shard pairs
    * ([[graft.streaming.CurateIngest.crossShardNearDups]]): an
    * operator can materialize the would-have-merged clusters without
    * re-curating anything.
    *
    * Algorithm (the contraction identity CC refreshes rest on): each
    * delta endpoint projects to its current root (unseen nodes are
    * their own roots); CC runs on that CONTRACTED root graph — O(delta)
    * edges, never O(accumulated) — and the resulting old-root → new-root
    * map rewrites the label table with one join. Exactness: contracting
    * a component to its representative preserves connectivity, and
    * because every existing cluster_id is its component's minimum doc
    * and new nodes enter as their own roots, the min over merged ROOTS
    * is the min over merged MEMBERS — so refreshed labels are
    * identical to batch CC over (old edges ∪ delta), spec- and
    * oracle-pinned. Idempotent under replay: re-applying a delta
    * projects both endpoints to the same root and the root graph goes
    * empty.
    *
    * Scale shape: the CC loop (the iterative part) runs on the
    * delta-contracted graph; the only full-table work is one
    * label-store join against the delta-bounded remap, which the
    * optimizer broadcasts when small. */
  def refreshClusters(labels: DataFrame, deltaPairs: DataFrame,
                      smallGraphThreshold: Long = smallGraphEdges): DataFrame = {
    val lab = labels.select(col("doc_id"), col("cluster_id")).localCheckpoint()
    val d = deltaPairs.select(col("a_id"), col("b_id")).localCheckpoint()
    val la = lab.select(col("doc_id").as("a_id"), col("cluster_id").as("ra"))
    val lb = lab.select(col("doc_id").as("b_id"), col("cluster_id").as("rb"))
    val rootPairs = d
      .join(la, Seq("a_id"), "left").join(lb, Seq("b_id"), "left")
      .select(coalesce(col("ra"), col("a_id")).as("a_id"),
        coalesce(col("rb"), col("b_id")).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
    val remap = connectedComponents(rootPairs, smallGraphThreshold)
      .select(col("doc_id").as("cluster_id"), col("cluster_id").as("new_root"))
    val newNodes = d.select(col("a_id").as("doc_id"))
      .unionAll(d.select(col("b_id").as("doc_id"))).distinct()
      .join(lab.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    lab.unionByName(newNodes)
      .join(remap, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("new_root"), col("cluster_id")).as("cluster_id"))
  }

  /** The q_incr_clusters engine side: the corpus's LSH candidate pairs
    * replayed as the ingestion loop would surface them — a pair
    * becomes visible in the shard of its LATER document (exactly when
    * [[graft.streaming.CurateIngest.crossShardNearDups]] can first
    * report it) — folded shard-by-shard through [[refreshClusters]]
    * from an empty labeling. Equals batch CC over all pairs (the flat
    * [[dupClustersSql]] oracle) because each contraction step
    * preserves connectivity and the min-root invariant. */
  def incrClusters(docs: DataFrame, shardSize: Long = 150,
                   maxId: Long = 600, n: Int = 4,
                   minEstJaccard: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = Dedup.minhashCandidates(
        docs.filter(col("doc_id") < maxId), n, minEstJaccard)
      .select(col("a_id"), col("b_id"),
        expr(s"greatest(a_id, b_id) div $shardSize").as("shard"))
      .localCheckpoint() // consumed once per shard below
    val nShards = ((maxId + shardSize - 1) / shardSize).toInt
    var labels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    for (i <- 0 until nShards)
      labels = refreshClusters(labels,
        pairs.filter(col("shard") === i.toLong)).localCheckpoint()
    labels
  }

  /** DuckDB twin of [[incrClusters]]: the incremental replay equals
    * flat batch CC, so the oracle IS [[dupClustersSql]] over the same
    * bounded corpus — the equivalence claim is the query. */
  def incrClustersSql(maxId: Long = 600, n: Int = 4,
                      minEstJaccard: Double = 0.5): String =
    s"""WITH documents AS (
       |  SELECT * FROM main.documents WHERE doc_id < $maxId)
       |SELECT * FROM (
       |${dupClustersSql(n, minEstJaccard)}
       |)""".stripMargin

  def dupClustersSql(n: Int = 4, minEstJaccard: Double = 0.5,
                     pairWhere: String = ""): String = {
    val w = if (pairWhere.isEmpty) "" else s"\n  WHERE $pairWhere"
    s"""WITH RECURSIVE cand AS MATERIALIZED (
       |  SELECT a_id, b_id FROM (
       |${Dedup.minhashCandidatesSql(n, minEstJaccard)}
       |  )$w),
       |edges AS MATERIALIZED (
       |  SELECT a_id AS src, b_id AS dst FROM cand
       |  UNION ALL
       |  SELECT b_id, a_id FROM cand),
       |walk(node, root) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, w.root FROM walk w JOIN edges e ON e.src = w.node)
       |SELECT node AS doc_id, min(root) AS cluster_id FROM walk GROUP BY 1""".stripMargin
  }
}
