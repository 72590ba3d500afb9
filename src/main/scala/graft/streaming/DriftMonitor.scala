package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The combined topology's MONITORING leg — the alerts the ingestion
  * stream exists to serve, computed ON the stream instead of as
  * after-the-fact batch reads: per-batch language-mix counts
  * ([[CurateIngest.shardMixDrift]]'s axis) and score-decile counts
  * ([[CurateIngest.qualityScoreDriftSketch]]'s axis, sketch binning —
  * no global sort anywhere) land as monoid rows in a `batch_id`-
  * partitioned store, and the PSI reads run over the store alone.
  *
  * Reference discipline: PSI over scores measures DATA drift only if
  * the score function and the bin edges are FIXED — a retraining
  * model would shift every histogram and bury the signal (exactly
  * the one-model semantics of the batch twin,
  * [[CurateIngest.qualityScoreDrift]], which scores the whole corpus
  * with one trained model). So the FIRST batch that has a deployed
  * model freezes the REFERENCE artifact — that model's weight table +
  * prior and the `percentile_approx` decile boundaries of that
  * batch's scores — into a write-once `batch_id=-2` sentinel
  * partition; every later batch scores and bins against the frozen
  * reference, map-side. (Rebinning/refreezing after a planned model
  * release is an operator action: drop the sentinel.)
  *
  * Replay discipline: batch rows land in their own `batch_id`
  * partition with dynamic overwrite ([[CurateIngest]]'s contract);
  * the sentinel is written at most once and never rewritten, so every
  * path through a crash window converges to the same store.
  *
  * Scale shape: scoring is a broadcast weight join over the batch's
  * SHARED token frame (no re-tokenize — the combined topology's one
  * tokenization feeds this leg too); everything after is a per-batch
  * groupBy over #langs + #bins keys, and the store holds
  * #batches · (#langs + #bins) count rows plus the vocab-sized
  * sentinel — the PSI read is post-aggregate arithmetic over
  * kilobytes. No compaction needed (the per-batch axis IS the read). */
object DriftMonitor {

  private val schema = StructType(Seq(
    StructField("axis", StringType), StructField("key", StringType),
    StructField("cnt", LongType), StructField("batch_id", LongType)))

  val LangAxis = "lang"
  val ScoreAxis = "score"
  private val BoundsAxis = "bounds"
  private val ModelAxis = "model"
  private val PriorAxis = "prior"
  private val RefId = -2L

  private case class Frozen(weights: DataFrame, prior: Long,
                            bounds: Seq[Long])

  /** The frozen reference artifact, if a batch has written it. `cnt`
    * carries the VALUE on the sentinel axes (boundary / weight /
    * prior) — documented reuse of the one-schema store. */
  private def frozenRef(spark: SparkSession,
                        driftPath: String): Option[Frozen] = {
    val sent = Stores.readStore(spark, driftPath, schema)
      .filter(col("batch_id") === RefId).localCheckpoint()
    val bounds = sent.filter(col("axis") === BoundsAxis)
      .select(col("key").cast("int").as("i"), col("cnt"))
      .collect().sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
    val prior = sent.filter(col("axis") === PriorAxis)
      .select(col("cnt")).collect().headOption.map(_.getLong(0))
    // all-or-nothing: a torn sentinel (crash mid-write) reads as
    // absent, and the next batch freezes a fresh reference
    (bounds.nonEmpty, prior) match {
      case (true, Some(p)) =>
        Some(Frozen(sent.filter(col("axis") === ModelAxis)
          .select(col("key").as("token"), col("cnt").as("w_u")), p, bounds))
      case _ => None
    }
  }

  private def binned(scored: DataFrame, bounds: Seq[Long]): DataFrame = {
    val bin = bounds.foldLeft(lit(1)) { (acc, b) =>
      acc + when(col("nb_score_micro") > b, 1).otherwise(0)
    }
    scored.groupBy(bin.cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("axis", lit(ScoreAxis))
  }

  /** One micro-batch's monitoring rows. `tokens` / `signals` are the
    * combined topology's shared token frame and per-doc gate signals
    * ([[graft.text.TextAnalysis.docSignals]]) — nothing here re-scans
    * text. */
  def writeDriftDelta(batch: DataFrame, tokens: DataFrame,
                      signals: DataFrame, batchId: Long,
                      driftPath: String, countsPath: String,
                      dstatsPath: String, minQualityPm: Long = 600,
                      nBins: Int = 10, accuracy: Int = 10000): Unit = {
    val spark = batch.sparkSession
    // axis 1 — language mix of the QUALITY-gated batch (language NOT
    // gated: the mix is what's being measured — shardMixDrift's rule)
    val lang = signals.filter(col("quality_pm") >= minQualityPm)
      .groupBy(col("lang_pred").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("axis", lit(LangAxis))
    // axis 2 — score deciles against the frozen reference; until a
    // reference exists the leg tries to freeze one (first batch with
    // a deployed model), staying silent before that
    val score: Option[DataFrame] = frozenRef(spark, driftPath) match {
      case Some(f) =>
        Some(binned(graft.text.QualityModel.scoreWithTokens(
          batch, tokens, f.weights, f.prior)
          .select(col("doc_id"), col("nb_score_micro")), f.bounds))
      case None =>
        val (w, prior) = QualityRefresh.modelStateBefore(spark,
          countsPath, dstatsPath, batchId)
        if (w.isEmpty) None
        else {
          val wPinned = w.localCheckpoint()
          val scored = graft.text.QualityModel.scoreWithTokens(
            batch, tokens, wPinned, prior)
            .select(col("doc_id"), col("nb_score_micro"))
            .localCheckpoint()
          val probs = (1 until nBins).map(_.toDouble / nBins)
          val row = scored.agg(percentile_approx(col("nb_score_micro"),
            array(probs.map(lit): _*), lit(accuracy))).head()
          val bs: Seq[Long] =
            if (row.isNullAt(0)) Seq.empty else row.getSeq[Long](0)
          if (bs.isEmpty) None
          else {
            // freeze scorer + binning, write-once; a replayed
            // reference batch finds the sentinel and takes the
            // frozen path to the identical rows
            import spark.implicits._
            wPinned.select(lit(ModelAxis).as("axis"),
                col("token").as("key"), col("w_u").as("cnt"))
              .unionByName(Seq((PriorAxis, "p", prior))
                .toDF("axis", "key", "cnt"))
              .unionByName(bs.zipWithIndex
                .map { case (b, i) => (BoundsAxis, i.toString, b) }
                .toDF("axis", "key", "cnt"))
              .withColumn("batch_id", lit(RefId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id").parquet(driftPath)
            Some(binned(scored, bs))
          }
        }
    }
    score.fold(lang)(s => lang.unionByName(s))
      .select(col("axis"), col("key"), col("cnt"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(driftPath)
  }

  /** PSI of each batch against its predecessor on one axis, straight
    * from the store: (batch_id, psi, n_keys) — the
    * [[graft.operators.Drift.mixDriftOfCounts]] dense-grid/lag chain
    * with batch_id as the window, [[CurateIngest.shardMixDrift]]'s
    * exact arithmetic. */
  def driftRead(spark: SparkSession, driftPath: String,
                axis: String): DataFrame = {
    val counts = Stores.readStore(spark, driftPath, schema)
      .filter(col("axis") === axis && col("batch_id") >= 0)
      .select(col("batch_id").as("window_start_ms"),
        col("key").as("event_type"), col("cnt"))
      .localCheckpoint()
    val contrib = ((col("ppm") - col("prev_ppm")) / lit(1e6)) *
      log(greatest(col("ppm"), lit(1L)).cast("double") /
        greatest(col("prev_ppm"), lit(1L)).cast("double"))
    graft.operators.Drift.mixDriftOfCounts(counts)
      .groupBy(col("window_start_ms").as("batch_id"))
      .agg(round(sum(round(contrib, 6)), 4).as("psi"),
        count(lit(1)).cast("int").as("n_keys"))
  }

  /** Batches whose PSI crosses the alert threshold (0.25 is the
    * conventional "significant shift" PSI line). */
  def driftAlerts(spark: SparkSession, driftPath: String, axis: String,
                  threshold: Double = 0.25): DataFrame =
    driftRead(spark, driftPath, axis)
      .filter(col("psi") >= threshold)
      .select(lit(axis).as("axis"), col("batch_id"), col("psi"),
        col("n_keys"))
}
