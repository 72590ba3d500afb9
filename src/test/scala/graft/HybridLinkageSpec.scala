package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Hybrid
import graft.operators.{Linkage, Packing}

/** Hybrid RRF retrieval, blocked fuzzy linkage, and BPE-budget packing
  * against hand-computed fixtures. */
class HybridLinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rrfSearch fuses both towers: two mid ranks beat one top rank") {
    // query doc 0. Lexical tower: doc2 (exact text) rk1, doc1 rk2.
    // Dense tower: doc3 (identical vector) rk1, doc1 rk2, doc2 rk3.
    // RRF: doc2 = 1/61+1/63 = .032266 > doc1 = 2/62 = .032258 > doc3 = 1/61.
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta filler1 filler2"),
      (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 1f)), (3L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val out = Hybrid.rrfSearch(docs, embs, qMaxId = 1L)
      .select("query_id", "doc_id", "rrf_score", "bm25_rk", "cos_rk", "rank")
      .as[(Long, Long, Double, Option[Int], Option[Int], Int)]
      .collect().sortBy(_._6).toSeq
    assert(out == Seq(
      (0L, 2L, 0.032266, Some(1), Some(3), 1),
      (0L, 1L, 0.032258, Some(2), Some(2), 2),
      (0L, 3L, 0.016393, None, Some(1), 3)), out.toString)
  }

  test("rrfSearchIndexed: stored artifacts only — no tokenization, raw vectors re-rank-only") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val embs = Tables.embeddings(spark, sf)
    // stored-state scenario: both towers' artifacts materialized (the
    // grown state after an append), as a serving stack would hold them
    val sp0 = graft.text.SparseIndex.build(docs.filter($"doc_id" < 25))
    val spG = {
      val g = graft.text.SparseIndex.append(sp0, docs.filter($"doc_id" >= 25))
      g.copy(postings = g.postings.localCheckpoint(),
        df = g.df.localCheckpoint(), stats = g.stats.localCheckpoint(),
        docIds = g.docIds.localCheckpoint())
    }
    val dn0 = graft.ann.IncrementalIndex.build(embs.filter($"vec_id" < 25))
    val dnG = {
      val g = graft.ann.IncrementalIndex.append(dn0, embs.filter($"vec_id" >= 25))
      g.copy(codes = g.codes.localCheckpoint(), cells = g.cells.localCheckpoint())
    }
    val out = Hybrid.rrfSearchIndexed(embs, spG, dnG, qMaxId = 5)
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("isFinalPlan=false"), "must gate the FINAL plan")
    // the search must tokenize NOTHING — query terms come from postings
    assert(!plan.contains("regexp_extract_all"),
      s"search re-tokenized the corpus:\n${plan.take(4000)}")
    // the 1-row stats crossJoin is the ONE sanctioned BNLJ (broadcast
    // side is a single aggregate row); anything more is pair-shaped
    assert(plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1 &&
      !plan.contains("CartesianProduct"), s"pair-shaped plan:\n${plan.take(4000)}")
    // artifacts are read as materialized state, not re-derived
    assert(plan.contains("ExistingRDD"), s"artifacts not read:\n${plan.take(2000)}")
    // raw embedding scans: every one except the exact re-rank's lookup
    // side must carry the query-id pushdown (≤ topK·refine rows reach
    // the unfiltered side through the shortlist join)
    val embScans = plan.linesIterator
      .filter(l => l.contains("parquet") && l.contains("embeddings")).toList
    val unfiltered = embScans.filterNot(_.contains("LessThan(vec_id"))
    assert(embScans.nonEmpty, s"dense tower lost its query source:\n$plan")
    assert(unfiltered.size <= 1,
      s"raw base vectors read outside the re-rank:\n${unfiltered.mkString("\n")}")
    // and the fused result still ranks k rows per query
    assert(out.count() == 5 * 10)
  }

  test("bestFuzzyMatch links within block, bounded distance, min tiebreak") {
    val recs = Seq(
      (1L, "red widget"), (2L, "rad widget"), (3L, "bluexyz widget"),
      (4L, "red gadget"), (5L, "red widget"), (6L, "ted widget"))
      .toDF("p_partkey", "p_name")
    val out = Linkage.bestFuzzyMatch(recs)
      .select("p_partkey", "match_key", "dist")
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    // 3 (nothing within 3 edits) and 4 (alone in its block) drop out;
    // exact-identical names never link (1↔5); key tiebreak at equal dist
    assert(out == Seq((1L, 2L, 1), (2L, 1L, 1), (5L, 2L, 1), (6L, 1L, 1)),
      out.toString)
  }

  test("packShards with bpeMerges packs on BPE tokens") {
    // sennrich vocab: "low" → [low, </w>] = 2 syms, "newest" → 1 sym
    val docs = Seq((0L, "low low"), (8L, "newest newest newest"))
      .toDF("doc_id", "text")
    val out = Packing.packShards(docs, nShards = 8, tokenBudget = 4L,
        bpeMerges = Some(graft.text.Bpe.sennrichMerges))
      .select("doc_id", "shard", "n_tokens", "chunk")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 0L, 4L, 0L), (8L, 0L, 3L, 1L)), out.toString)
  }
}
