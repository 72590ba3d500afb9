package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ann.IncrementalIndex

/** The production index-update path (r5 verdict item 3): new embeddings
  * are appended to a frozen IVF-PQ index — assigned to existing cells,
  * encoded against the existing codebook — and searches see old+new
  * WITHOUT retraining. */
class IncrementalIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  // ScaleProbeSpec's discipline: drive THIS DataFrame's own
  // QueryExecution and assert on the FINAL adaptive plan
  private def ranPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("isFinalPlan=false"))
    plan
  }

  test("appending a shard executes zero aggregates — no codebook retrain") {
    val embs = Tables.embeddings(spark, sf)
    val idx = IncrementalIndex.build(embs.filter($"vec_id" < 400))
    val grown = IncrementalIndex.append(idx, embs.filter($"vec_id" >= 400))
    // Lloyd retraining cannot exist without groupBy sums; the appended
    // state must be joins + windows only (encode = shard ⋈ broadcast
    // codebook + one shard-local window; assign = map over broadcast
    // centroids). The EXECUTED plan is the proof, not the intent.
    val codesPlan = ranPlan(grown.codes)
    val cellsPlan = ranPlan(grown.cells)
    for (plan <- Seq(codesPlan, cellsPlan); agg <- Seq(
        "HashAggregate", "SortAggregate", "ObjectHashAggregate"))
      assert(!plan.contains(agg),
        s"append plan contains $agg (retraining?):\n${plan.take(3000)}")
    // and the frozen artifacts really are frozen: same objects
    assert(grown.cb eq idx.cb)
    assert(grown.cents eq idx.cents)
  }

  test("appendIdempotent: replayed shard is a no-op, new ids still land") {
    val embs = Tables.embeddings(spark, sf).localCheckpoint()
    val idx = IncrementalIndex.build(embs.filter($"vec_id" < 100))
    val shard = embs.filter($"vec_id" >= 100 && $"vec_id" < 150)
    val once = IncrementalIndex.append(idx, shard)
    val replayed = IncrementalIndex.appendIdempotent(once, shard)
    assert(replayed.codes.count() == once.codes.count(),
      "replayed shard doubled the codes table")
    assert(replayed.cells.count() == once.cells.count())
    val fresh = IncrementalIndex.appendIdempotent(once,
      embs.filter($"vec_id" >= 150 && $"vec_id" < 160))
    assert(fresh.cells.count() == once.cells.count() + 10)
  }

  test("search after append equals the monolithically-encoded index") {
    val embs = Tables.embeddings(spark, sf)
    val base = embs.filter($"vec_id" < 400)
    val idx = IncrementalIndex.build(base)
    val grown = IncrementalIndex.append(idx, embs.filter($"vec_id" >= 400))
    // encoding the full corpus in one pass against the same frozen
    // codebook must give the identical searchable state: the append is
    // pure bookkeeping, not an approximation
    val mono = idx.copy(
      codes = graft.ann.Pq.encodeWith(embs, idx.cb, graft.ann.Pq.defaultM),
      cells = graft.ann.IvfKnn.assign(embs, idx.cents)
        .select($"vec_id", $"cell"))
    val a = IncrementalIndex.search(embs, grown).collect().map(_.toSeq).toSet
    val b = IncrementalIndex.search(embs, mono).collect().map(_.toSeq).toSet
    assert(a == b)
    // non-vacuous: the searched state covers the appended ids
    val appendedSearchable = grown.cells.filter($"vec_id" >= 400).count()
    assert(appendedSearchable == embs.filter($"vec_id" >= 400).count())
  }

  test("streaming micro-batches append through foreachBatch; search sees all") {
    implicit val ctx = spark.sqlContext
    val embs = Tables.embeddings(spark, sf).localCheckpoint()
    val base = embs.filter($"vec_id" < 30).localCheckpoint()
    var idx = IncrementalIndex.build(base, kCells = 8)
    val arriving = embs.filter($"vec_id" >= 30 && $"vec_id" < 60)
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    val ms = MemoryStream[(Long, Int, Array[Float])]
    val q = ms.toDF().toDF("vec_id", "label", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the streaming ingest path: each micro-batch lands as an
        // append against the frozen artifacts (localCheckpoint = the
        // "write to the index store" stand-in, keeping later batches'
        // lineage flat)
        idx = IncrementalIndex.append(idx, batch)
        idx = idx.copy(codes = idx.codes.localCheckpoint(),
          cells = idx.cells.localCheckpoint())
      }
      .start()
    try {
      val (b1, b2) = arriving.splitAt(arriving.length / 2)
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    // every streamed vector is searchable…
    assert(idx.cells.filter($"vec_id" >= 30).count() == arriving.length)
    // …and the search over old+new matches the same frozen index built
    // in one shot over the union corpus
    val union = embs.filter($"vec_id" < 60)
    val mono = idx.copy(
      codes = graft.ann.Pq.encodeWith(union, idx.cb, graft.ann.Pq.defaultM),
      cells = graft.ann.IvfKnn.assign(union, idx.cents)
        .select($"vec_id", $"cell"))
    val got = IncrementalIndex.search(union, idx, queryMaxId = 5, topK = 3,
      nprobe = 4, refine = 4).collect().map(_.toSeq).toSet
    val want = IncrementalIndex.search(union, mono, queryMaxId = 5, topK = 3,
      nprobe = 4, refine = 4).collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }
}
