package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.text.QualityModel

/** Streaming leg of the model-based quality filter: the Naive Bayes
  * count store refreshed on shard arrival — [[GraphRank]]'s monoid
  * edge-delta discipline applied to [[QualityModel]]'s sufficient
  * statistics. Per-token class counts and per-class doc counts are
  * monoids under +, so summed per-batch deltas equal the batch
  * statistics over everything seen, and the refreshed model is
  * BIT-EQUAL to [[QualityModel.nbQuality]]'s trained on the
  * cumulative corpus (spec-asserted) — the filter retrains as the
  * corpus ingests, with no raw-text reprocessing.
  *
  * Replay discipline: each batch's count deltas land in their own
  * `batch_id=` partition with overwrite semantics (crash-replay
  * rewrites exactly its own state); the model read model is derived,
  * never stored, so it is always consistent with the counts. */
object QualityRefresh {

  private val countsSchema = StructType(Seq(
    StructField("token", StringType), StructField("pc", LongType),
    StructField("nc", LongType), StructField("batch_id", LongType)))
  private val dstatsSchema = StructType(Seq(
    StructField("p_docs", LongType), StructField("n_docs", LongType),
    StructField("batch_id", LongType)))

  private def readStore(spark: SparkSession, path: String,
                        schema: StructType): DataFrame =
    Stores.readStore(spark, path, schema)

  /** One micro-batch's sufficient-statistic deltas, each in its own
    * batch_id partition. */
  def writeCountsDelta(batch: DataFrame, batchId: Long, countsPath: String,
                       dstatsPath: String,
                       minQualityPm: Long = 600): Unit = {
    val (cls, dstats) = QualityModel.classCounts(batch, minQualityPm)
    cls.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(countsPath)
    dstats.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dstatsPath)
  }

  /** The model over everything seen so far: per-token sums across all
    * delta partitions (the monoid merge), then the exact
    * [[QualityModel.modelFromCounts]] arithmetic. Returns the
    * broadcastable (token, w_u) table and the integer prior. */
  def modelState(spark: SparkSession, countsPath: String,
                 dstatsPath: String): (DataFrame, Long) = {
    val cls = readStore(spark, countsPath, countsSchema)
      .groupBy(col("token"))
      .agg(sum(col("pc")).as("pc"), sum(col("nc")).as("nc"))
    val d = readStore(spark, dstatsPath, dstatsSchema)
      .agg(coalesce(sum(col("p_docs")), lit(0L)).as("p"),
        coalesce(sum(col("n_docs")), lit(0L)).as("n")).head()
    QualityModel.modelFromCounts(cls, d.getLong(0), d.getLong(1))
  }

  /** Fold the `batch_id < upToBatch` delta partitions into one
    * `batch_id=-1` partition — counts are monoids, so the sum-merge is
    * lossless and [[modelState]] reads the identical totals before and
    * after (spec-asserted). Same replay contract as
    * [[CurateIngest.compactStores]]: only batches ≥ upToBatch can
    * replay, and their reads select the same summed row set; a crash
    * between write and delete leaves duplicate partitions whose sums
    * DOUBLE-COUNT — unlike the set-semantics ingest stores — so a
    * restart must re-run compaction (idempotent: the re-merge reads
    * whatever is present below the cut and rewrites partition -1)
    * before the next model read. */
  def compactCounts(spark: SparkSession, countsPath: String,
                    dstatsPath: String, upToBatch: Long): Unit = {
    val cls = readStore(spark, countsPath, countsSchema)
      .filter(col("batch_id") < upToBatch)
      .groupBy(col("token"))
      .agg(sum(col("pc")).as("pc"), sum(col("nc")).as("nc"))
      .withColumn("batch_id", lit(-1L))
      .localCheckpoint() // pin BEFORE overwriting a partition we read
    cls.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(countsPath)
    Stores.dropBatchPartitions(spark, countsPath, upToBatch)
    val d = readStore(spark, dstatsPath, dstatsSchema)
      .filter(col("batch_id") < upToBatch)
      .agg(coalesce(sum(col("p_docs")), lit(0L)).as("p_docs"),
        coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"))
      .withColumn("batch_id", lit(-1L))
      .localCheckpoint()
    d.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dstatsPath)
    Stores.dropBatchPartitions(spark, dstatsPath, upToBatch)
  }

  /** The wired pipeline: a document stream maintaining the count
    * stores; the model itself stays derived (read via [[modelState]],
    * applied via [[QualityModel.scoreWith]]). `compactEvery` bounds
    * the store tree at n+1 partitions ([[CurateIngest.start]]'s
    * contract). */
  def start(docStream: DataFrame, countsPath: String, dstatsPath: String,
            checkpoint: String, minQualityPm: Long = 600,
            compactEvery: Option[Long] = None): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeCountsDelta(batch, batchId, countsPath, dstatsPath, minQualityPm)
        compactEvery.foreach { n =>
          if (batchId > 0 && batchId % n == 0)
            compactCounts(batch.sparkSession, countsPath, dstatsPath,
              upToBatch = batchId)
        }
      }
      .start()
}
