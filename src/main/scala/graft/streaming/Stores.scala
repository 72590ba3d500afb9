package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared read discipline for the batch_id-partitioned state stores
  * (fingerprints, signatures, kept docs, pair deltas, label
  * snapshots, classifier counts).
  *
  * Two hazards every store reader must handle identically:
  *  - a micro-batch whose rows all fail a gate writes only _SUCCESS,
  *    and schema inference over a file-less directory throws — which
  *    would kill the stream on the NEXT batch; the pinned schema makes
  *    an empty store read as an empty frame instead.
  *  - existence must resolve through Hadoop's FileSystem for the
  *    path's OWN scheme (hdfs://, s3a://, file:), never the driver's
  *    local filesystem — a remote store must be honored as existing,
  *    and a genuinely unreadable one must be an error, never silently
  *    an empty state. */
private[streaming] object Stores {

  def readStore(spark: SparkSession, path: String,
                schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(path)
  }
}
