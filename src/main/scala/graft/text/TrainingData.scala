package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The whole training-data pipeline as one entry point — the library's
  * "main()" for corpus preparation, composing the oracle-checked
  * stages end-to-end:
  *
  *   1. [[Curate.curate]]   — score → gate → exact dedup → keep-best
  *      near-dedup (the surviving corpus, with curation metadata)
  *   2. [[Chunking.chunkDocs]] — context-window chunks with overlap
  *      over the survivors' text
  *   3. deterministic training order — each chunk gets a salted-hash
  *      (shard, position) via the same RNG-free construction as
  *      [[graft.operators.Sampling.shuffleOrder]]; a new salt is a new
  *      epoch permutation
  *
  * Output, one row per training chunk:
  *   (doc_id, chunk_idx, chunk_text, n_tokens, lang_pred, quality_pm,
  *    shard, position)
  *
  * Each stage is individually hash-checked against DuckDB (q_curate,
  * q_chunk, q_shuffle_order); the composition adds no new distributed
  * machinery — curate's survivors join their text (broadcast-sized
  * drop list logic inside curate), chunking is map-side, and the
  * epoch order is one rank window per shard. The curated corpus is
  * the natural artifact boundary: write it once, re-chunk/re-shuffle
  * per training configuration without re-running dedup. */
object TrainingData {

  def prepare(docs: DataFrame,
              minQualityPm: Long = 600,
              langs: Seq[String] = Seq("en", "de"),
              chunkTokens: Int = 64, overlap: Int = 8,
              nShards: Int = 8, salt: String = "epoch0"): DataFrame = {
    // FUSED: curateDocs hands the survivors WITH text + metadata, and
    // chunkDocs carries the metadata columns through its explode — the
    // pipeline adds ZERO joins beyond curation's own (the chunk table,
    // the biggest in the pipeline at 100 TB, is never shuffled for a
    // join; its only shuffle is the per-shard epoch-order sort).
    val keptDocs = Curate.curateDocs(docs, minQualityPm, langs)
    val chunks = Chunking.chunkDocs(
      keptDocs.select(col("doc_id"), col("text"), col("lang_pred"),
        col("quality_pm")), chunkTokens, overlap)
    val h = conv(substring(md5(concat_ws(":", lit(salt),
      col("doc_id").cast("string"), col("chunk_idx").cast("string"))), 1, 15),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"), col("chunk_idx"))
    chunks
      .withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("position", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"),
        col("n_tokens"), col("lang_pred"), col("quality_pm"),
        col("shard"), col("position"))
  }

  /** Persist the epoch's training order as one manifest file per
    * shard — the artifact boundary between corpus preparation and the
    * training loop: a resumed run re-reads `shard-N.manifest` and
    * replays the exact order without touching Spark, and a new salt
    * ([[prepare]]) is a new epoch's permutation. Everything upstream
    * is RNG-free salted hashing, so the same (corpus, salt) always
    * serializes to BYTE-identical manifests — resume-safe by
    * construction, and a cheap integrity check (diff the manifest)
    * against a silently-changed corpus.
    *
    * Format: `<outDir>/shard-<shard>.manifest`, lines
    * `position,doc_id,chunk_idx` in position order. Written
    * executor-side (one streaming pass per shard partition, no
    * collect): repartition on shard puts each shard wholly in one
    * partition; rows arrive position-sorted and roll to a new file on
    * shard change, so a partition holding several shards (hash
    * collision) still writes one file per shard. */
  def writeEpochManifest(prepared: DataFrame, outDir: String): Unit = {
    // the session's Hadoop conf must reach the executors (fs impls,
    // credentials, defaultFS come from spark.hadoop.*; a bare
    // `new Configuration()` ignores them) — Configuration isn't
    // serializable, so ship its entries and rebuild per partition
    val confEntries: Array[(String, String)] = {
      val c = prepared.sparkSession.sessionState.newHadoopConf()
      val it = c.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    prepared.select(col("shard"), col("position"), col("doc_id"),
        col("chunk_idx"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "position")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(outDir), conf)
        // write-to-temp + rename: a task that dies mid-write (or a
        // speculative duplicate) must never leave a truncated file at
        // the FINAL path — the resume contract reads it as a complete
        // epoch order. The temp name is attempt-unique; rename is the
        // commit (last attempt wins, both attempts wrote identical
        // bytes by determinism).
        val attempt = org.apache.spark.TaskContext.get() match {
          case null => java.util.UUID.randomUUID().toString
          case tc => s"${tc.partitionId()}-${tc.taskAttemptId()}"
        }
        var curShard = Int.MinValue
        var out: java.io.OutputStream = null
        var tmp: org.apache.hadoop.fs.Path = null
        def commit(): Unit = if (out != null) {
          out.close(); out = null
          val fin = new org.apache.hadoop.fs.Path(
            s"$outDir/shard-$curShard.manifest")
          fs.delete(fin, false)
          // rename IS the commit: on filesystems where it refuses an
          // existing destination (a concurrent speculative attempt
          // winning the delete/rename race) a false return would
          // silently leave the manifest missing or stale — fail the
          // task instead; determinism makes the retry safe
          if (!fs.rename(tmp, fin))
            throw new java.io.IOException(
              s"manifest commit failed: rename $tmp -> $fin")
          tmp = null
        }
        try {
          it.foreach { r =>
            val shard = r.getInt(0)
            if (shard != curShard) {
              commit()
              curShard = shard
              tmp = new org.apache.hadoop.fs.Path(
                s"$outDir/.shard-$shard.manifest.$attempt.tmp")
              out = fs.create(tmp, true)
            }
            out.write(s"${r.getLong(1)},${r.getLong(2)},${r.getLong(3)}\n"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          commit()
        } finally {
          // abort path: close and remove this attempt's orphan tmp so a
          // failed task leaves nothing behind (tmp is nulled on every
          // successful rename, so it is non-null here exactly when an
          // uncommitted attempt file exists; the retry uses a new
          // attempt-unique name)
          if (out != null) out.close()
          if (tmp != null) fs.delete(tmp, false)
        }
      }
  }

  /** DuckDB twin of [[prepare]], composed from the same per-stage SQL
    * the stage queries are checked with: curation CTEs → chunk explode
    * over `kept` → salted-hash epoch order. */
  def prepareSql(minQualityPm: Long = 600,
                 langs: Seq[String] = Seq("en", "de"),
                 chunkTokens: Int = 64, overlap: Int = 8,
                 nShards: Int = 8, salt: String = "epoch0"): String = {
    val stride = chunkTokens - overlap
    s"""WITH ${Curate.curateCtes(minQualityPm, langs)},
       |chunks AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       |         array_to_string(w[i * $stride + 1 : i * $stride + $chunkTokens], ' ') AS chunk_text,
       |         CAST(len(w[i * $stride + 1 : i * $stride + $chunkTokens]) AS BIGINT) AS n_tokens,
       |         lang_pred, quality_pm
       |  FROM (SELECT doc_id, lang_pred, quality_pm,
       |          regexp_extract_all(text, '\\S+') AS w,
       |          unnest(generate_series(0,
       |            CASE WHEN len(regexp_extract_all(text, '\\S+')) <= $chunkTokens THEN 0
       |                 ELSE (len(regexp_extract_all(text, '\\S+')) - $chunkTokens + $stride - 1) // $stride END)) AS i
       |        FROM kept)),
       |hashed AS (
       |  SELECT *, ('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR) || ':' ||
       |               CAST(chunk_idx AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM chunks)
       |SELECT doc_id, chunk_idx, chunk_text, n_tokens, lang_pred, quality_pm,
       |       CAST(h % $nShards AS INT) AS shard,
       |       CAST(row_number() OVER (PARTITION BY h % $nShards
       |                               ORDER BY h, doc_id, chunk_idx) AS BIGINT) AS position
       |FROM hashed""".stripMargin
  }
}
