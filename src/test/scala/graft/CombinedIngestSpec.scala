package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ClusterRefresh, CombinedIngest, CurateIngest, QualityRefresh}

/** The one-stream multi-leg soak: curation, cluster refresh, quality
  * model and BM25 index appends all share one file stream's
  * micro-batches, the whole topology is killed mid-stream and
  * restarted, and at the end EVERY store must equal both (a) the same
  * stores from an uninterrupted golden run and (b) its own flat batch
  * twin. This is the deployment shape the per-leg recovery specs
  * approximate one store at a time. */
class CombinedIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def enDoc(tail: String): String =
    ("the cat and the dog walked over a bridge and the sun rose " * 4) + tail

  // distinct stopword-rich bodies, far apart in shingle space
  private val bodyB = "the ship sailed over the sea and the wind blew from the north " * 4
  private val bodyC = "a bird flew over the hills and the rain fell on the green grass " * 4
  private val bodyD = "the horse ran through the field and the moon rose over the lake " * 4
  private val bodyE = "many rivers run to the ocean where the tide turns and the boats drift home " * 4
  private val bodyF = "the spark and the join ran over the window with the hash once more " * 4
  private val bodyG = "a spark of the hash hit the join while the window held the line " * 4

  private val base = enDoc("")
  private val nearA0 = base + "zzz qqq 11111 22222 33333"
  private val nearA1 = base + "zzz qqq 11111 22222 99999" // ≈ nearA0
  private val nearA2 = base + "zzz qqq 11111 88888 99999" // ≈ nearA1
  private val nearC = bodyC + "extra tail words"          // ≈ bodyC
  private val nearD1 = bodyD + "extra tail words"         // ≈ bodyD
  private val nearD2 = bodyD + "extra tail words and then more" // ≈ nearD1

  // six id-ordered shards (shardSize=150), with planted cross-shard
  // exact dups, a transitive near-dup chain, a second near-dup pair,
  // an INTRA-batch near-dup pair continued by a later chain arrival,
  // and junk docs that fail the gate (the quality model's neg class)
  private val shards: Seq[Seq[(Long, String)]] = Seq(
    Seq(10L -> nearA0, 20L -> bodyB, 30L -> "zzz qqq www eee flux"),
    Seq(160L -> bodyB /* exact dup → drop */, 170L -> bodyC,
      180L -> nearA1 /* ≈10 → strict drop, pair */),
    Seq(310L -> bodyD, 315L -> nearD1 /* intra-batch pair: dropsBest
      drops one of {310,315}, the pair must still be recorded */,
      320L -> "qqq www capacitor zzz"),
    Seq(460L -> bodyE,
      470L -> nearA2 /* ≈180's tombstone → drop, chain pair */),
    Seq(610L -> bodyF, 620L -> nearC /* ≈170 → drop, pair */),
    Seq(760L -> bodyG, 765L -> nearD2 /* ≈315's tombstone → drop;
      chain through the intra-batch-dropped doc */,
      770L -> "eee www resistor qqq"))
  private val allRows = shards.flatten
  private def allDocs: DataFrame = allRows.toDF("doc_id", "text")
    .withColumn("n_chars", length(col("text")).cast("long"))

  private def keptSet(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet
  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
  private def scoresOf(weights: DataFrame, prior: Long): Map[Long, Long] =
    graft.text.QualityModel.scoreWith(allDocs, weights, prior)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
  private def searchOf(root: String): Seq[(Long, Double, Int)] =
    graft.text.SparseIndex.search(CombinedIngest.bm25Index(spark, root),
      Seq("spark", "join", "window", "hash"))
      .as[(Long, Double, Int)].collect().toSeq

  test("kill+restart mid-stream: every store equals the uninterrupted twin and its batch twin") {
    val work = java.nio.file.Files.createTempDirectory("combined").toString
    val src = new java.io.File(s"$work/src"); src.mkdirs()
    // one parquet FILE per shard, mtimes increasing so the file
    // source's (timestamp, path) order is the id order
    shards.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$work/tmp$i"
      rows.toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(src, f"shard$i%02d.parquet")
      assert(part.renameTo(dst))
      dst.setLastModified(1700000000000L + i * 60000L)
    }
    def start(root: String) = CombinedIngest.start(
      spark.readStream
        .schema("doc_id LONG, text STRING, n_chars LONG")
        .option("maxFilesPerTrigger", 1).parquet(src.toString),
      root, s"$root/chk", compactEvery = Some(2L))

    // interrupted run: kill after ≥2 committed batches, restart, drain
    val r1 = s"$work/r1"
    val q1 = start(r1)
    var waited = 0
    while (q1.recentProgress.length < 2 && waited < 600) {
      Thread.sleep(100); waited += 1
    }
    q1.stop()
    val q1b = start(r1)
    q1b.processAllAvailable(); q1b.stop()
    assert(q1b.exception.isEmpty, s"restarted stream died: ${q1b.exception}")

    // golden uninterrupted run over the same shards
    val r2 = s"$work/r2"
    val q2 = start(r2)
    q2.processAllAvailable(); q2.stop()
    assert(q2.exception.isEmpty, s"golden stream died: ${q2.exception}")

    // ---- store-for-store: interrupted == golden
    val kept1 = keptSet(CurateIngest.keptState(spark, s"$r1/kept"))
    assert(kept1 == keptSet(CurateIngest.keptState(spark, s"$r2/kept")))
    val labels1 = labelsOf(ClusterRefresh.latestLabels(spark, s"$r1/labels"))
    assert(labels1 ==
      labelsOf(ClusterRefresh.latestLabels(spark, s"$r2/labels")))
    val (w1, p1) = QualityRefresh.modelState(spark, s"$r1/counts",
      s"$r1/dstats")
    val (w2, p2) = QualityRefresh.modelState(spark, s"$r2/counts",
      s"$r2/dstats")
    assert(p1 == p2 && scoresOf(w1, p1) == scoresOf(w2, p2))
    val search1 = searchOf(r1)
    assert(search1 == searchOf(r2))

    // ---- batch twins
    // curation: the deterministic strict loop over the same shards
    assert(kept1 == keptSet(CurateIngest.incrCurateStrict(allDocs,
      maxId = 900L)))
    // the intra-batch pair keeps exactly one of {310, 315} (dropsBest
    // by quality); everything else is pinned
    assert((kept1 & Set(310L, 315L)).size == 1, s"kept $kept1")
    assert(kept1 -- Set(310L, 315L) ==
      Set(10L, 20L, 170L, 460L, 610L, 760L), s"kept $kept1")
    // clusters: the deferred chain merged transitively, the pair
    // trail rebuilds the same labeling
    assert(labels1(10L) == labels1(180L) && labels1(180L) == labels1(470L))
    assert(labels1(170L) == labels1(620L) &&
      labels1(170L) != labels1(10L), s"labels $labels1")
    // the INTRA-batch pair reached the pairs store (batch self-probe):
    // {310, 315} cluster together, and the later arrival 765 chains
    // through 315's tombstone into the same cluster
    assert(labels1(310L) == labels1(315L) &&
      labels1(315L) == labels1(765L) &&
      labels1(310L) != labels1(10L), s"labels $labels1")
    assert(labels1 == labelsOf(graft.dedup.Clusters.connectedComponents(
      ClusterRefresh.pairState(spark, s"$r1/pairs").drop("batch_id"))))
    // quality model: bit-equal to batch training on everything seen
    val batchScores = graft.text.QualityModel.nbQuality(allDocs)
      .select("doc_id", "nb_score_micro").as[(Long, Long)].collect().toMap
    assert(scoresOf(w1, p1) == batchScores)
    // BM25: the store-backed index scores the kept corpus exactly as
    // the flat batch scorer does
    val keptDocs = allDocs.join(
      CurateIngest.keptState(spark, s"$r1/kept").select("doc_id"),
      Seq("doc_id"))
    val batchBm25 = graft.text.CorpusStats.bm25(keptDocs)
      .as[(Long, Double, Int)].collect().toSeq
    assert(search1 == batchBm25 && search1.nonEmpty,
      s"bm25 $search1 vs $batchBm25")
    // compaction ran mid-stream on every store: trees are bounded
    assert(new java.io.File(s"$r2/postings/batch_id=-1").exists,
      "postings never compacted")
    assert(new java.io.File(s"$r2/counts/batch_id=-1").exists,
      "counts never compacted")
  }
}
