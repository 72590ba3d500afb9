package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gen(rows: Long) = spark.read
    .format("graft.sources.EventGen")
    .option("totalRows", rows).load()

  test("batch read produces exactly totalRows deterministic rows") {
    val a = gen(5000).collect()
    val b = gen(5000).collect()
    assert(a.length == 5000)
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    val r = gen(5).orderBy($"event_id").collect()
    assert(r.map(_.getAs[Long]("event_id")).sameElements(Array(0L, 1L, 2L, 3L, 4L)))
    assert(r.forall(x => graft.sources.EventGen.types.contains(x.getAs[String]("event_type"))))
  }

  test("column pruning reaches the scan") {
    val df = gen(1000).select($"event_type")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("cols=event_type"),
      s"scan not pruned to event_type:\n$scanDesc")
  }

  test("micro-batch streaming reads up to totalRows and stops") {
    val stream = spark.readStream
      .format("graft.sources.EventGen")
      .option("totalRows", 25000).option("rowsPerBatch", 10000)
      .load()
    val q = stream.groupBy($"event_type").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("gen_stream").start()
    try {
      q.processAllAvailable()
      val total = spark.table("gen_stream").agg(sum($"count")).head().getLong(0)
      assert(total == 25000)
    } finally q.stop()
  }

  test("generated aggregate matches its own closed form") {
    // event_type counts over h2(i) % 5: verify against a recomputation
    // in the driver (independent of the source machinery)
    val got = gen(10000).groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = (0L until 10000L)
      .groupBy(i => graft.sources.EventGen.types((graft.sources.EventGen.h2(i) % 5).toInt))
      .view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }
}
