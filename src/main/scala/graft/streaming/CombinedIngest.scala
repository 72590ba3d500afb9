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
  *   drift/                    — monitoring      (DriftMonitor)
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

  /** One micro-batch through all four legs (+ the compaction tick).
    *
    * The batch is tokenized ONCE: the `(doc_id, token, tf, dl)` frame
    * ([[SparseIndex.postingsOf]]) plus the per-doc gate signals derived
    * from it ([[graft.text.TextAnalysis.docSignals]]) feed the curation
    * gate, the classifier counts AND the postings — the three legs that
    * each used to re-scan the batch's text (measured per-batch delta in
    * SCALING.md). The only remaining text pass is the strict leg's
    * shingle/MinHash signature of post-gate survivors, which is the
    * signature store's write unit, not a tokenization. */
  /** The curation-gate frame for one batch: the heuristic gate over
    * the shared signals, optionally intersected with the Gopher
    * repetition gate ([[CurateIngest.gateShardGopher]]'s rule — the
    * Dolma/FineWeb stack on the stream). With the gate on, the
    * repetition signals derive from the SHARED positional frame
    * (`repBase` — [[graft.text.Repetition.positionalBase]], the same
    * pinned scan the tf frame exploded from: one tokenization even
    * with the gate on), restricted to the heuristic-gate SURVIVORS so
    * the narrow fold's per-doc gram sort/fold CPU (the signals are a
    * zero-shuffle projection since r13) never pays for docs the
    * quality/language gate already rejected (the intersection is
    * unchanged — gopher only ever removes docs from the
    * heuristic-gate set). */
  private def gateOf(signals: DataFrame, repBase: Option[DataFrame],
                     minQualityPm: Long, langs: Seq[String],
                     gopherGate: Boolean,
                     gopherQualityStops: Option[Seq[String]]): DataFrame = {
    val base = CurateIngest.gateFromSignals(signals, minQualityPm, langs)
    def survivors: DataFrame = repBase.get
      .join(base.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val afterRep =
      if (!gopherGate) base
      else base.join(graft.text.Repetition.signalsFromBase(survivors)
          .filter(col("gopher_pass") === 1).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
    gopherQualityStops.fold(afterRep) { stops =>
      afterRep.join(
        graft.text.GopherQuality.qualitySignalsFromBase(survivors, stops)
          .filter(col("gopher_quality_pass") === 1).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
    }
  }

  /** The batch's shared frames: with the Gopher gate OFF the single
    * scan is the tf tokenization itself; with it ON the single scan is
    * the pinned POSITIONAL frame (ws/lines/paras), from which both the
    * tf frame and the repetition n-gram explode derive.
    *
    * The positional frame is pinned with `localCheckpoint` (row
    * objects), not the columnar cache — a verdict that has FLIPPED
    * once and is therefore kept as a measured knob: the r12
    * `combinedgopher` A/B chose `persist` when the repetition leg was
    * the exploded relational form (columnar 32.0 vs lchk 34.3 s/batch),
    * but under the r14 native run-stats leg the same A/B measures
    * lchk 9.57 vs columnar 14.88 s/batch — rebuilding 600-element
    * string arrays from the compressed columnar cache per row now
    * costs more than the row-object pin, because the consumers got
    * ~10× cheaper and the cache READ became the bottleneck (SCALING.md
    * r14 `combinedgopher`). The frame is micro-batch-sized (trigger-
    * bounded), so the row-object pin is not a memory hazard; the
    * caller ([[processBatch]]/[[processBatchBucketed]]) unpersists it
    * after the batch's legs have all written.
    *
    * `pinColumnar = true` pins with the columnar cache instead — the
    * losing arm, kept runnable so the trade-off stays re-measurable as
    * the consumers' plan shapes evolve (ScaleSoak `combinedgopher`
    * runs both arms). */
  private def sharedFrames(batch: DataFrame, gopherGate: Boolean,
                           pinColumnar: Boolean = false)
      : (DataFrame, Option[DataFrame]) =
    if (!gopherGate)
      (SparseIndex.postingsOf(batch.select(col("doc_id"), col("text")))
        .localCheckpoint(), None)
    else {
      // forceSpread: the micro-batch path is where non-empty-partition
      // skew was actually observed (a range-contiguous shard arriving
      // as 4/32 non-empty partitions — the partition-COUNT gate can't
      // see it — measured ~1.9× the fold wall and ~4× through the
      // cache build + narrow legs; ScaleSoak repdiag4, SCALING.md r14).
      // The batch is trigger-bounded, so the exchange is micro-batch-
      // sized; batch entry points keep the upward-only gate.
      val pb0 = graft.text.Repetition.positionalBase(batch,
        forceSpread = true)
      val pb = if (pinColumnar) pb0.persist() else pb0.localCheckpoint()
      (SparseIndex.postingsFromBase(pb).localCheckpoint(), Some(pb))
    }

  /** `gopherQualityStops = Some(stopList)` additionally gates on the
    * NON-repetition Gopher Table A1 rules
    * ([[graft.text.GopherQuality]]) — shape heuristics riding the SAME
    * positional frame as the repetition gate (zero extra scans, zero
    * shuffle: the signals are per-doc array arithmetic), restricted to
    * heuristic-gate survivors like the repetition leg. The stop list
    * is the one per-corpus knob (GopherQuality.DefaultStopWords is the
    * published set). */
  /** Dolma-ordered anonymization on the combined topology
    * ([[graft.text.CorpusStats.piiMask]]): masks the batch BEFORE the
    * shared tokenization, so every derived artifact — postings tokens,
    * signatures, fingerprints, kept text, drift rows — sees masked
    * text and no persisted store ever holds a raw email/IP/phone.
    * Codegen'd projection, zero shuffle. */
  private def anonBatch(batch: DataFrame, anonymize: Boolean): DataFrame =
    if (!anonymize) batch
    else batch.select(col("doc_id"),
        graft.text.CorpusStats.piiMask(col("text")).as("text"))
      // n_chars describes the text the stores will actually hold
      .withColumn("n_chars", length(col("text")).cast("long"))

  def processBatch(batch: DataFrame, batchId: Long, root: String,
                   minQualityPm: Long = 600,
                   langs: Seq[String] = Seq("en", "de"),
                   minEstJaccard: Double = 0.5,
                   compactEvery: Option[Long] = None,
                   sigRetentionBatches: Option[Long] = None,
                   gopherGate: Boolean = false,
                   gopherQualityStops: Option[Seq[String]] = None,
                   anonymize: Boolean = false,
                   repBasePinColumnar: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val b = anonBatch(batch, anonymize)
    // THE one tokenization of this batch, pinned; every leg derives
    val (tokens, repBase) =
      sharedFrames(b, gopherGate || gopherQualityStops.nonEmpty,
        repBasePinColumnar)
    val signals = graft.text.TextAnalysis.docSignals(b, tokens)
      .localCheckpoint()
    // leg 1 — strict curation: fps/sigs/kept land in partition batchId
    CurateIngest.writeShardStrictGated(
      gateOf(signals, repBase, minQualityPm, langs, gopherGate,
        gopherQualityStops),
      batchId, s"$root/fps", s"$root/sigs", s"$root/kept", minEstJaccard)
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
      .select(col("a_id"), col("b_id")).distinct()
    ClusterRefresh.refreshBatch(pairs, batchId, s"$root/pairs",
      s"$root/labels")
    // leg 3 — quality-classifier sufficient statistics, from the
    // shared token frame (no re-tokenize, no re-score)
    val (cls, dstats) = graft.text.QualityModel.classCountsFromTokens(
      tokens, signals, minQualityPm)
    QualityRefresh.writeCountsDeltaFrom(cls, dstats, batchId,
      s"$root/counts", s"$root/dstats")
    // leg 5 — drift monitoring: language-mix + deployed-model
    // score-decile counts, riding the shared signals (sketch binning,
    // no global sort; the PSI alert reads run over the store alone)
    DriftMonitor.writeDriftDelta(b, tokens, signals, batchId,
      s"$root/drift", s"$root/counts", s"$root/dstats", minQualityPm)
    // leg 4 — BM25 postings of the batch's KEPT docs: the shared frame
    // restricted to the survivors (tf/dl are per-doc, so the
    // restriction equals tokenizing only the kept docs)
    tokens
      .join(CurateIngest.keptBatch(spark, s"$root/kept", batchId),
        Seq("doc_id"))
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
    // drop the batch's columnar positional cache (every leg has
    // written; CacheManager entries are not GC-reclaimed)
    repBase.foreach(_.unpersist())
  }

  /** The wired topology. */
  def start(docStream: DataFrame, root: String, checkpoint: String,
            minQualityPm: Long = 600,
            langs: Seq[String] = Seq("en", "de"),
            minEstJaccard: Double = 0.5,
            compactEvery: Option[Long] = None,
            sigRetentionBatches: Option[Long] = None,
            gopherGate: Boolean = false,
            gopherQualityStops: Option[Seq[String]] = None,
            anonymize: Boolean = false): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, root, minQualityPm, langs,
          minEstJaccard, compactEvery, sigRetentionBatches, gopherGate,
          gopherQualityStops, anonymize)
      }
      .start()

  // ---------------------------- bucketed combined mode (100 TB shape)

  private val postingsTableSchema = StructType(
    postingsSchema.fields.toSeq.filterNot(_.name == "batch_id"))

  /** [[bm25Index]] under bucketed compaction: the token-bucketed
    * postings table ∪ recent deltas, deduped (absorbs the compaction
    * crash window), with the bucketed kept store as the inventory. */
  def bm25IndexBucketed(spark: SparkSession, root: String,
                        tablePrefix: String): SparseIndex.Index =
    SparseIndex.fromStore(
      CurateIngest.tableOrEmpty(spark, s"${tablePrefix}_postings",
          postingsTableSchema)
        .unionByName(
          Stores.readStore(spark, s"$root/postings", postingsSchema)
            .filter(col("batch_id") >= 0).drop("batch_id"))
        .dropDuplicates("doc_id", "token"),
      CurateIngest.keptStateBucketed(spark, s"$root/kept", tablePrefix)
        .select(col("doc_id")))

  /** Postings deltas (and, on migration, a plain `batch_id=-1`
    * sentinel) folded into the `<prefix>_postings` metastore table,
    * bucketed + sorted by `token` — one file per bucket, so the df
    * rollup and term probes read a token-clustered layout. Same crash
    * contract as [[CurateIngest.compactStoresBucketed]]: set-semantics
    * reads absorb the window between table write and delta delete. */
  private def compactPostingsBucketed(spark: SparkSession, path: String,
                                      upToBatch: Long, tablePrefix: String,
                                      buckets: Int = 32): Unit = {
    CurateIngest.tableOrEmpty(spark, s"${tablePrefix}_postings",
        postingsTableSchema)
      .unionByName(Stores.readStore(spark, path, postingsSchema)
        .filter(col("batch_id") < upToBatch).drop("batch_id"))
      .dropDuplicates("doc_id", "token")
      .repartition(buckets, col("token"))
      .sortWithinPartitions(col("token"))
      .localCheckpoint() // pin BEFORE overwriting a table we just read
      .write.mode("overwrite")
      .bucketBy(buckets, "token").sortBy("token")
      .format("parquet").saveAsTable(s"${tablePrefix}_postings")
    Stores.dropBatchPartitions(spark, path, upToBatch)
    Stores.dropCompactedPartition(spark, path)
  }

  /** [[processBatch]] under BUCKETED store compaction — the 100 TB
    * deployment shape: every per-shard store join reads a metastore
    * bucket table on its exact join keys (`fingerprint`, `(band,
    * bkey)`, `doc_id`, `token`) with no store-side exchange
    * (plan-asserted in CombinedIngestSpec), and the cluster leg's
    * detection probes the bucketed signature table the same way —
    * compacted side bucket-aligned, recent-delta side broadcast-sized,
    * self-probe for intra-batch pairs. Same shared-tokenization
    * discipline and replay contract as [[processBatch]]. */
  def processBatchBucketed(batch: DataFrame, batchId: Long, root: String,
                           tablePrefix: String,
                           minQualityPm: Long = 600,
                           langs: Seq[String] = Seq("en", "de"),
                           minEstJaccard: Double = 0.5,
                           compactEvery: Option[Long] = None,
                           sigRetentionBatches: Option[Long] = None,
                           gopherGate: Boolean = false,
                           gopherQualityStops: Option[Seq[String]] = None,
                           anonymize: Boolean = false)
      : Unit = {
    val spark = batch.sparkSession
    val b = anonBatch(batch, anonymize)
    val (tokens, repBase) =
      sharedFrames(b, gopherGate || gopherQualityStops.nonEmpty)
    val signals = graft.text.TextAnalysis.docSignals(b, tokens)
      .localCheckpoint()
    // leg 1 — strict curation against the split (bucketed ∪ delta) stores
    CurateIngest.writeShardStrictBucketedGated(
      gateOf(signals, repBase, minQualityPm, langs, gopherGate,
        gopherQualityStops),
      batchId, s"$root/fps", s"$root/sigs", s"$root/kept", tablePrefix,
      minEstJaccard)
    // leg 2 — detection over the split history: bucketed table side
    // joins bucket-aligned, delta side is small, self-probe unchanged
    val (sigC, sigD) = CurateIngest.sigStateSplit(spark, s"$root/sigs",
      tablePrefix, batchId)
    val sigBatch = CurateIngest.sigBatch(spark, s"$root/sigs", batchId)
    val pairs = CurateIngest.crossShardNearDupsFromSigs(sigC, sigBatch,
        minEstJaccard)
      .unionByName(CurateIngest.crossShardNearDupsFromSigs(sigD, sigBatch,
        minEstJaccard))
      .unionByName(CurateIngest.crossShardNearDupsFromSigs(sigBatch,
        sigBatch, minEstJaccard))
      .select(col("a_id"), col("b_id")).distinct()
    ClusterRefresh.refreshBatch(pairs, batchId, s"$root/pairs",
      s"$root/labels")
    // legs 3+4+5 — identical to the plain mode (counts are a fold
    // store, postings deltas land per batch and compact to the token
    // table, drift rows ride the shared signals)
    val (cls, dstats) = graft.text.QualityModel.classCountsFromTokens(
      tokens, signals, minQualityPm)
    QualityRefresh.writeCountsDeltaFrom(cls, dstats, batchId,
      s"$root/counts", s"$root/dstats")
    DriftMonitor.writeDriftDelta(b, tokens, signals, batchId,
      s"$root/drift", s"$root/counts", s"$root/dstats", minQualityPm)
    tokens
      .join(CurateIngest.keptBatch(spark, s"$root/kept", batchId),
        Seq("doc_id"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$root/postings")
    compactEvery.foreach { n =>
      if (batchId > 0 && batchId % n == 0) {
        CurateIngest.compactStoresBucketed(spark, s"$root/fps",
          s"$root/kept", Some(s"$root/sigs"), upToBatch = batchId,
          tablePrefix = tablePrefix,
          sigRetentionBatches = sigRetentionBatches)
        QualityRefresh.compactCounts(spark, s"$root/counts",
          s"$root/dstats", upToBatch = batchId)
        ClusterRefresh.compactSnapshots(spark, s"$root/labels",
          upToBatch = batchId)
        compactPostingsBucketed(spark, s"$root/postings",
          upToBatch = batchId, tablePrefix = tablePrefix)
      }
    }
    repBase.foreach(_.unpersist())
  }

  /** The wired bucketed topology. */
  def startBucketed(docStream: DataFrame, root: String, checkpoint: String,
                    tablePrefix: String,
                    minQualityPm: Long = 600,
                    langs: Seq[String] = Seq("en", "de"),
                    minEstJaccard: Double = 0.5,
                    compactEvery: Option[Long] = None,
                    sigRetentionBatches: Option[Long] = None,
                    gopherGate: Boolean = false,
                    gopherQualityStops: Option[Seq[String]] = None,
                    anonymize: Boolean = false)
      : StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchBucketed(batch, batchId, root, tablePrefix,
          minQualityPm, langs, minEstJaccard, compactEvery,
          sigRetentionBatches, gopherGate, gopherQualityStops, anonymize)
      }
      .start()
}
