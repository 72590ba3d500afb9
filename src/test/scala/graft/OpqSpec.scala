package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ann.{Opq, Pq}

/** OPQ allocation + recall gate (VERDICT r7 item 8). The allocation
  * is integer-exact, so these are exact structural assertions; the
  * recall test pins the MEASURED outcome on the near-iid synthetic
  * corpus — the permutation is recall-neutral (no structure to
  * exploit), while the refine re-rank clears the k256 plain ceiling —
  * so a regression in either direction (a permutation that suddenly
  * scrambles recall, or a refine leg that stops refining) fails here. */
class OpqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.01"
  private val m = Pq.defaultM

  test("allocation is a balanced bijection onto subspace slots") {
    val rows = Opq.allocation(Tables.embeddings(spark, sf), m).collect()
    val d = rows.length
    assert(d == 64 && d % (2 * m) == 0)
    // newpos is a permutation of 0..d-1
    assert(rows.map(_.getAs[Int]("newpos")).sorted.toSeq == (0 until d))
    // every subspace gets exactly d/m dims
    val bySub = rows.groupBy(_.getAs[Int]("sub")).view.mapValues(_.length)
    assert(bySub.keySet == (0 until m).toSet && bySub.values.forall(_ == d / m))
    // snake balance: each subspace's total energy is within one
    // block-spread of any other (the allocation's whole point)
    val energy = rows.groupBy(_.getAs[Int]("sub"))
      .view.mapValues(_.map(_.getAs[Long]("energy")).sum).values.toSeq
    val spread = (energy.max - energy.min).toDouble / energy.max
    info(s"per-subspace energy spread: ${"%.4f".format(spread)}")
    assert(spread < 0.05, s"unbalanced: $energy")
  }

  test("permute reorders values per the allocation, schema unchanged") {
    val embs = Tables.embeddings(spark, sf)
    val alloc = Opq.allocation(embs, m).collect()
      .map(r => r.getAs[Int]("dim") -> r.getAs[Int]("newpos")).toMap
    val perm = Opq.permute(embs, m)
    assert(perm.schema == embs.select("vec_id", "label", "embedding").schema
      || perm.columns.toSeq == Seq("vec_id", "label", "embedding"))
    val before = embs.orderBy("vec_id").select("embedding")
      .head.getSeq[Float](0)
    val after = perm.orderBy("vec_id").select("embedding")
      .head.getSeq[Float](0)
    for (dim <- 0 until before.length)
      assert(after(alloc(dim)) == before(dim),
        s"dim $dim should land at ${alloc(dim)}")
  }

  test("planted anisotropic corpus: the permutation wins decisively") {
    // the synthetic embeddings table is near-iid, so q_opq_recall pins
    // NEUTRALITY there; this corpus plants the precondition OPQ
    // exploits — all variance in dims 0-7, i.e. ONE subvector under
    // the contiguous split — and the snake allocation must then spread
    // it one signal dim per subspace. Hash-decorrelated generator
    // (fract(sin(...)·43758.5453), the classic shader hash): measured
    // plain ≈ 0.08 vs permuted ≈ 0.88 at k=16 — the 11× swing that
    // proves the operator, not just its neutrality.
    val embs = spark.range(500).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), j ->
        CAST(((sin(id * 12.9898D + j * 78.233D) * 43758.5453D)
          - floor(sin(id * 12.9898D + j * 78.233D) * 43758.5453D) - 0.5D)
          * CASE WHEN j < 8 THEN 1.0D ELSE 0.05D END AS FLOAT))""")
        .as("embedding"),
      (col("id") % 10).cast("int").as("label"))
      .localCheckpoint()
    val got = Opq.opqRecall(embs, queryMaxId = 50, topK = 5, m = m,
        k = 16, iters = 2, refine = 2)
      .collect()
      .map(r => r.getAs[String]("cfg") -> r.getAs[Double]("recall")).toMap
    info(s"anisotropic recall@5: $got")
    assert(got("opq_k16") > got("pq_k16") + 0.3,
      s"OPQ must dominate when variance concentrates in one subvector: $got")
  }

  test("recall gate: refine clears the plain ceiling, opq measured neutral") {
    val got = Opq.opqRecall(Tables.embeddings(spark, sf))
      .collect()
      .map(r => r.getAs[String]("cfg") -> r.getAs[Double]("recall")).toMap
    info(s"recall@5: $got")
    assert(got.keySet ==
      Set("pq_k256", "opq_k256", "pq_k256_r4", "exhaustive"))
    assert(got("exhaustive") == 1.0)
    // the measured story: refine×4 re-rank beats plain k256 by a wide
    // margin (the r7 ceiling was ~0.68); the OPQ permutation stays
    // within a neutral band of plain on this near-iid corpus (it must
    // not DEGRADE badly — a scrambled permutation would crater it)
    assert(got("pq_k256_r4") > got("pq_k256") + 0.15,
      s"refine leg stopped refining: $got")
    assert(got("pq_k256_r4") > 0.80, s"refine floor: $got")
    assert(math.abs(got("opq_k256") - got("pq_k256")) < 0.15,
      s"permutation moved recall outside the neutral band: $got")
  }
}
