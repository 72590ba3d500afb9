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
}
