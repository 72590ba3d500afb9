package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Physical-plan assertions: the scale properties the code comments
  * promise must actually appear in the executed plans — filters reaching
  * the parquet scan, pruned read schemas, broadcast joins for dims,
  * partial/final aggregation, codegen'd vector kernels. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter+projection are pushed into the parquet scan") {
    val plan = planOf(Scalars.filterProject(Tables.events(spark, sf)))
    assert(plan.contains("PushedFilters: ["), s"no pushdown in:\n$plan")
    assert(plan.contains("EqualTo(event_type,purchase)"), s"predicate not pushed:\n$plan")
    // props/ts/event_type must be pruned from the read schema
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("event_id") && !readSchema.contains("props"),
      s"column pruning failed: $readSchema")
  }

  test("dimension joins broadcast; fact table is not shuffled for the join") {
    val plan = planOf(Relational.revenueByNation(
      Tables.lineitem(spark, sf), Tables.supplier(spark, sf), Tables.nation(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("promo share: part dim broadcasts, single aggregate exchange") {
    val plan = planOf(Relational.promoRevenueShare(
      Tables.lineitem(spark, sf), Tables.part(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("windowed aggregation is partial+final around one exchange") {
    val plan = planOf(EventAggregator.aggregate(Tables.events(spark, sf)))
    val nAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(nAggs >= 2, s"expected partial+final HashAggregate:\n$plan")
  }

  test("semi join plans as LeftSemi without materializing probe side") {
    val plan = planOf(Relational.lateOrders(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf)))
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
  }

  test("codegen dot product participates in whole-stage codegen") {
    val df = graft.ann.Similarity.knnBrute(Tables.embeddings(spark, sf), 2, 3)
    df.collect() // AQE: codegen spans appear once the final plan exists
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("dot_product_f"), s"custom expression missing:\n$plan")
    // formatted mode marks codegen stages with "[codegen id : N]"; the
    // Project evaluating dot_product_f must be inside one
    assert(plan.contains("[codegen id :"), s"no codegen spans:\n$plan")
    assert(plan.split("\n").exists(l =>
      l.contains("Project") && l.contains("[codegen id :")),
      s"project not codegen'd:\n$plan")
  }

  test("relational joins match expected row counts") {
    val rev = Relational.revenueByNation(Tables.lineitem(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf))
    assert(rev.count() > 0 && rev.count() <= 25) // at most one row per nation
    val top = Relational.topCustomers(Tables.orders(spark, sf), Tables.customer(spark, sf))
    assert(top.count() == 10)
  }

  test("anti join plans as LeftAnti with the date filter below the join") {
    val df = Relational.idleCustomers(Tables.customer(spark, sf), Tables.orders(spark, sf))
    val plan = planOf(df)
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    // the cutoff predicate must be pushed into the orders scan, not
    // evaluated post-join
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"cutoff not pushed to scan:\n$plan")
  }

  test("ROLLUP plans one Expand + partial/final aggregate, not a rescan per set") {
    val plan = planOf(Behavior.typeDayRollup(Tables.events(spark, sf)))
    assert(plan.linesIterator.count(_.contains("Expand [")) == 1,
      s"expected exactly one Expand:\n$plan")
    assert(plan.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"grouping sets must not rescan the input:\n$plan")
  }

  test("hopping windows keep the single-shuffle tumbling shape") {
    val plan = planOf(Windows.hoppingCounts(Tables.events(spark, sf)))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"hopping agg should shuffle once (+AQE read):\n$plan") // agg exchange only
    assert(plan.linesIterator.count(_.contains("FileScan parquet")) == 1)
  }

  test("packing windows sort within shard partitions, no global sort") {
    val plan = planOf(Packing.packShards(Tables.documents(spark, sf)))
    assert(!plan.contains("rangepartitioning"),
      s"global sort leaked into packing:\n$plan")
    assert(plan.contains("hashpartitioning(shard"),
      s"expected shard-hash shuffle:\n$plan")
  }

  test("quantized candidate pass uses codegen dot_product_i and broadcasts queries") {
    val df = graft.ann.Quantize.quantKnn(Tables.embeddings(spark, sf), 2, 3)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("dot_product_i"), s"int dot product missing:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"queries side not broadcast:\n$plan")
  }

  test("Q5 joins: all four dims broadcast, exactly one fact-fact join") {
    val plan = planOf(Relational.regionalRevenue(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.supplier(spark, sf),
      Tables.nation(spark, sf), Tables.region(spark, sf)))
    val nBroadcast = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(nBroadcast >= 4, s"dims not broadcast:\n$plan")
    val factFact = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(factFact <= 1, s"more than one shuffle join:\n$plan")
    // region + date filters must reach the scans
    assert(plan.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)]")
      || plan.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$plan")
  }

  test("bloom semi join prefilters the fact scan before any exchange") {
    val plan = planOf(BloomJoin.urgentRevenue(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf)))
    assert(plan.contains("might_contain"), s"no bloom prefilter:\n$plan")
    // the prefilter must sit below the first exchange: find the deepest
    // scan-side Filter and check it carries might_contain
    val mcLine = plan.linesIterator.indexWhere(_.contains("might_contain"))
    val exLine = plan.linesIterator.indexWhere(_.contains("Exchange"))
    assert(mcLine >= 0 && (exLine < 0 || mcLine > exLine || !plan.contains("SortMergeJoin")),
      s"bloom filter not map-side:\n$plan")
  }

  test("moving revenue: daily pre-agg below the window, RANGE frame") {
    val plan = planOf(Windows.movingRevenue(Tables.orders(spark, sf)))
    assert(plan.contains("RangeFrame"), s"no range frame:\n$plan")
    val aggIdx = plan.linesIterator.indexWhere(_.contains("HashAggregate"))
    val winIdx = plan.linesIterator.indexWhere(_.contains("Window"))
    assert(aggIdx > winIdx && winIdx >= 0,
      s"expected aggregate below window:\n$plan")
  }

  test("lineDedup: boilerplate set broadcasts, reconstruction has no window") {
    val df = graft.dedup.Dedup.lineDedup(Tables.documents(spark, sf))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate set must broadcast, not shuffle the corpus:\n$plan")
    assert(!plan.contains("Window"),
      s"in-order reconstruction must use the sorted-struct aggregate, not a window:\n$plan")
  }

  test("importanceWeights: ratio table broadcasts, corpus never pair-joins") {
    val df = graft.text.CorpusStats.importanceWeights(
      Tables.documents(spark, sf))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket-ratio table must broadcast onto the token stream:\n$plan")
    // the only acceptable non-hash joins are the 1-row totals appends
    // (constant-folded to BNLJ, codegen'd — the `*(n)` prefix); the
    // corpus side must never reach a shuffle join
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no corpus-side shuffle join belongs in this plan:\n$plan")
  }

  test("semanticDedup: pairwise pass shuffles on the cluster key only") {
    val df = graft.ann.KMeans.semanticDedup(Tables.embeddings(spark, sf))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(cluster"),
      s"pair join must be keyed on cluster:\n$plan")
    assert(plan.contains("dot_product_f"),
      s"cosine must use the codegen kernel:\n$plan")
  }

  test("transitions: window and aggregate, bigram count partial-aggregates") {
    val plan = planOf(Windows.transitions(Tables.events(spark, sf)))
    assert(plan.contains("lag("), s"no lag window:\n$plan")
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"bigram count should partial-aggregate:\n$plan")
  }

  test("random projection is a single map stage: no exchange, no join") {
    val plan = planOf(graft.ann.Projection.randomProject(
      Tables.embeddings(spark, sf)))
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"projection must not join:\n$plan")
  }

  test("drift midpoint rides a scalar subquery, not a per-row join") {
    val df = graft.operators.Drift.eventTypeDrift(Tables.events(spark, sf))
    val plan = planOf(df)
    assert(plan.contains("Subquery") || plan.contains("scalar-subquery"),
      s"expected scalar subquery:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"midpoint must not become a BNLJ on the corpus side:\n$plan")
  }

  test("native winnow explodes per block, not per character") {
    val df = graft.text.TextAnalysis.winnow(Tables.documents(spark, sf))
    val plan = planOf(df)
    assert(plan.contains("winnow_fps"), s"native expression missing:\n$plan")
    // the old formulation needed a (doc, block) min-aggregate; the
    // native one emits final rows straight from the generator
    assert(!plan.contains("HashAggregate"),
      s"per-block minima must come from the expression, not an aggregate:\n$plan")
  }

  test("bpe pair counting: one corpus explode feeding one count exchange") {
    val plan = planOf(graft.text.Bpe.pairCounts(Tables.documents(spark, sf)))
    val generates = plan.linesIterator.count(_.contains("Generate"))
    assert(generates == 2, s"expected word + pair explodes only, got $generates:\n$plan")
  }

  test("chunking is shuffle-free: the 100 TB plan is the scan plan") {
    val plan = planOf(graft.text.Chunking.chunkDocs(
      Tables.documents(spark, sf)))
    // Tables.spread may add one adaptive round-robin on a tiny scan;
    // beyond that there must be no exchange and no window/aggregate
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
    assert(!plan.contains("HashAggregate"), s"no aggregate expected:\n$plan")
  }

  test("TrainingData.prepare: chunk-scale data never reaches a join") {
    val df = graft.text.TrainingData.prepare(
      Tables.documents(spark, sf), chunkTokens = 32, overlap = 4, nShards = 4)
    val plan = df.queryExecution.optimizedPlan
    // curation's own joins (LSH bands, drop list) sit BELOW the chunk
    // explode; the chunk table itself must flow join-free into the
    // epoch-order window — a join subtree mentioning chunk_text means
    // the fused pipeline regressed to re-joining chunk-scale data
    val bad = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.toString.contains("chunk_text") => j
    }
    assert(bad.isEmpty, s"chunk-scale data reaches a join:\n${bad.mkString("\n")}")
    assert(plan.toString.contains("chunk_text"), "chunk stage missing from plan")
  }

  test("mixture sample: inventory collapses before any corpus-wide work") {
    val plan = planOf(graft.operators.Sampling.mixtureSample(
      Tables.documents(spark, sf)))
    // the keep_n side must reach the probe join as a broadcast
    assert(plan.contains("BroadcastHashJoin"), s"keep_n not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("hybrid RRF: query vocab broadcasts into the token stream, " +
       "fusion never touches the corpus") {
    val plan = planOf(graft.text.Hybrid.rrfSearch(
      Tables.documents(spark, sf), Tables.embeddings(spark, sf)))
    // the tf prune join and the scoring join must both be broadcasts —
    // a SMJ there would shuffle the corpus token stream on `token`
    assert(plan.contains("BroadcastHashJoin"), s"query vocab not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side SMJ in towers:\n$plan")
    // dense tower keeps the knnBrute broadcast-NLJ-on-queries shape;
    // the only nested loops allowed are the broadcast query side and
    // the 1-row stats crossJoin
    val bnlj = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"unexpected nested-loop joins ($bnlj):\n$plan")
  }

  test("linkage: one shuffle on the block key, threshold levenshtein in plan") {
    val plan = planOf(graft.operators.Linkage.bestFuzzyMatch(
      Tables.part(spark, sf)))
    // blocked self-join: equi-join on block (either side), and the
    // bounded 3-arg levenshtein (with its -1 sentinel filter) survives
    // to the physical plan — the banded-DP early exit is the scale win
    assert(plan.contains("levenshtein"), s"levenshtein not in plan:\n$plan")
    assert(plan.contains("3)") || plan.contains(", 3"),
      s"threshold form lost:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"all-pairs join:\n$plan")
  }
}
