package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.text.SparseIndex

/** The deployed ingestion topology as ONE stream — the shape a real
  * corpus pipeline runs in production: every maintained read model
  * (curated corpus, duplicate-cluster labels, quality-classifier
  * counts, BM25 postings) consumes the SAME micro-batches, so a crash
  * hits all stores at once and recovery must bring every one of them
  * back to its batch twin together. Each leg is individually
  * recovery-proven (CurateStreamSpec, ClustersSpec, CorpusOpsSpec,
  * SparseIndexSpec); this object is the composition, and
  * CombinedIngestSpec kills the whole topology mid-stream and asserts
  * the restarted run is store-for-store equal to an uninterrupted one.
  *
  * Store layout under `root`:
  * {{{
  *   fps/ sigs/ kept/          — strict curation (CurateIngest)
  *   pairs/ labels/            — cluster refresh (ClusterRefresh)
  *   counts/ dstats/           — quality model   (QualityRefresh)
  *   postings/                 — BM25 index      (SparseIndex store)
  * }}}
  *
  * Replay discipline: every leg writes only `batch_id = B` partitions
  * (dynamic overwrite) from reads pinned strictly below B, so the one
  * batch foreachBatch can replay rewrites exactly its own state in
  * every store — the [[CurateIngest]] contract, inherited wholesale.
  * The cluster leg's pairs come from the STORE-PROBING detection
  * ([[CurateIngest.crossShardNearDupsFromSigs]] over history sigs ×
  * the batch's own sig rows, plus the batch's self-probe for
  * intra-batch pairs): detection tokenizes nothing, and the pair
  * trail doubles as the labels store's rebuild path.
  *
  * Compaction tick: every `compactEvery` batches ALL stores compact in
  * the same foreachBatch — ingestion stores fold to their clustered
  * partition, counts fold under the folded_hi watermark, superseded
  * label snapshots drop, postings fold to a token-clustered partition
  * — so the combined tree stays bounded at O(compactEvery) partitions
  * per store, the single-leg contract preserved under composition. */
object CombinedIngest {

  private val postingsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("token", StringType),
    StructField("tf", LongType), StructField("dl", IntegerType),
    StructField("batch_id", LongType)))

  /** The searchable BM25 read model over everything kept so far:
    * postings store (full-row dedup absorbs the compaction crash
    * window, like [[CurateIngest.keptState]]) + the kept store as the
    * doc inventory. */
  def bm25Index(spark: SparkSession, root: String): SparseIndex.Index =
    SparseIndex.fromStore(
      Stores.readStore(spark, s"$root/postings", postingsSchema)
        .drop("batch_id").dropDuplicates("doc_id", "token"),
      CurateIngest.keptState(spark, s"$root/kept").select(col("doc_id")))

  /** Postings partitions < upToBatch folded into one token-clustered
    * `batch_id=-1` partition — postings rows are unique per
    * (doc_id, token), so the distinct-merge is set-semantics and the
    * crash window degrades to duplicates [[bm25Index]] absorbs. */
  private def compactPostings(spark: SparkSession, path: String,
                              upToBatch: Long, nFiles: Int = 32): Unit = {
    val folded = Stores.readStore(spark, path, postingsSchema)
      .filter(col("batch_id") < upToBatch)
      .drop("batch_id").distinct()
      .withColumn("batch_id", lit(-1L))
      .repartition(nFiles, col("token"))
      .sortWithinPartitions(col("token"))
      .localCheckpoint() // pin BEFORE overwriting a partition we read
    folded.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(path)
    Stores.dropBatchPartitions(spark, path, upToBatch)
  }

  /** One micro-batch through all four legs (+ the compaction tick). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
                   minQualityPm: Long = 600,
                   langs: Seq[String] = Seq("en", "de"),
                   minEstJaccard: Double = 0.5,
                   compactEvery: Option[Long] = None,
                   sigRetentionBatches: Option[Long] = None): Unit = {
    val spark = batch.sparkSession
    // leg 1 — strict curation: fps/sigs/kept land in partition batchId
    CurateIngest.writeShardStrict(batch, batchId, s"$root/fps",
      s"$root/sigs", s"$root/kept", minQualityPm, langs, minEstJaccard)
    // leg 2 — cluster refresh over this batch's near-dup pairs:
    // history signatures (strictly pre-batch) probed against the
    // batch's own just-written sig partition, UNION the batch's
    // self-probe — a self-probe IS minhashCandidates over the batch
    // ([[CurateIngest.deferredClusters]]'s contract), and without it
    // an intra-batch pair (A≈B arriving together; dropsBest silently
    // drops one) would never reach the pairs/labels stores, so a later
    // chain through the dropped doc would under-merge. Both reads are
    // deterministic under replay.
    val sigBatch = CurateIngest.sigBatch(spark, s"$root/sigs", batchId)
    val pairs = CurateIngest.crossShardNearDupsFromSigs(
        CurateIngest.sigState(spark, s"$root/sigs", batchId),
        sigBatch, minEstJaccard)
      .unionByName(CurateIngest.crossShardNearDupsFromSigs(
        sigBatch, sigBatch, minEstJaccard))
      .select(col("a_id"), col("b_id"))
    ClusterRefresh.refreshBatch(pairs, batchId, s"$root/pairs",
      s"$root/labels")
    // leg 3 — quality-classifier sufficient statistics
    QualityRefresh.writeCountsDelta(batch, batchId, s"$root/counts",
      s"$root/dstats", minQualityPm)
    // leg 4 — BM25 postings of the batch's KEPT docs (curation feeds
    // the index; text comes from the in-flight batch, never a re-read)
    SparseIndex.postingsOf(
        batch.select(col("doc_id"), col("text"))
          .join(CurateIngest.keptBatch(spark, s"$root/kept", batchId),
            Seq("doc_id")))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$root/postings")
    // compaction tick — every store together
    compactEvery.foreach { n =>
      if (batchId > 0 && batchId % n == 0) {
        CurateIngest.compactStores(spark, s"$root/fps", s"$root/kept",
          Some(s"$root/sigs"), upToBatch = batchId,
          sigRetentionBatches = sigRetentionBatches)
        QualityRefresh.compactCounts(spark, s"$root/counts",
          s"$root/dstats", upToBatch = batchId)
        ClusterRefresh.compactSnapshots(spark, s"$root/labels",
          upToBatch = batchId)
        compactPostings(spark, s"$root/postings", upToBatch = batchId)
      }
    }
  }

  /** The wired topology. */
  def start(docStream: DataFrame, root: String, checkpoint: String,
            minQualityPm: Long = 600,
            langs: Seq[String] = Seq("en", "de"),
            minEstJaccard: Double = 0.5,
            compactEvery: Option[Long] = None,
            sigRetentionBatches: Option[Long] = None): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, minQualityPm, langs,
          minEstJaccard, compactEvery, sigRetentionBatches)
      }
      .start()
}
