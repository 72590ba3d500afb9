package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * RNG-free: the sort key is a seeded md5-derived hash of the row id, so
  * the sample is reproducible across runs, partitionings, and engines —
  * the property that makes a 100 TB curation job auditable. Per-stratum
  * capping goes through row_number over (stratum, hash), which Spark
  * executes as WindowGroupLimit: each partition keeps only its local
  * top-cap before the shuffle, so the exchange carries O(strata·cap)
  * rows, not the corpus.
  */
object Sampling {

  /** 60-bit seeded hash of the id, identical in Spark and DuckDB
    * (same construction as [[graft.dedup.Dedup.seededHash]]). */
  private def idHash(seed: Int) =
    conv(substring(md5(concat(lit(seed.toString), lit(":"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")

  /** Up to `cap` docs per stratum, hash-ranked. Equal-allocation
    * stratified sampling: small strata keep everything, big strata get a
    * uniform deterministic subset. */
  def stratifiedByHash(docs: DataFrame, stratum: String = "lang",
                       cap: Int = 50, seed: Int = 7): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(idHash(seed), col("doc_id"))
    docs.select(col(stratum), col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
  }

  def stratifiedByHashSql(stratum: String = "lang", cap: Int = 50,
                          seed: Int = 7): String =
    s"""SELECT $stratum, doc_id, CAST(rk AS INT) AS rk FROM (
       |  SELECT $stratum, doc_id,
       |         row_number() OVER (PARTITION BY $stratum ORDER BY
       |           (('0x' || substr(md5($seed || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT),
       |           doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= $cap""".stripMargin

  /** Deterministic global shuffle for training order: every doc gets a
    * (shard, position) from a salted hash — a new salt is a new epoch
    * permutation, reproducible across runs, partitionings, and engines
    * (RNG-free, like everything else in this file). The per-shard
    * position sort shuffles on the shard key once; at 100 TB pick
    * nShards so a shard's rows fit a task's sort buffer — the trainer
    * then streams shards in order, which is exactly how large corpora
    * are served to data loaders. */
  def shuffleOrder(docs: DataFrame, nShards: Int = 8,
                   salt: String = "epoch0"): DataFrame = {
    val h = conv(substring(md5(concat_ws(":", lit(salt),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("position", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("position"))
  }

  def shuffleOrderSql(nShards: Int = 8, salt: String = "epoch0"): String =
    s"""SELECT doc_id, CAST(h % $nShards AS INT) AS shard,
       |       CAST(row_number() OVER (PARTITION BY h % $nShards
       |                               ORDER BY h, doc_id) AS BIGINT) AS position
       |FROM (SELECT doc_id,
       |        ('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |      FROM documents)""".stripMargin
}
