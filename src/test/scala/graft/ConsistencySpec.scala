package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Cross-query consistency on real data: independent operators must
  * agree about the same underlying facts. */
class ConsistencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("pivoted serving counts total to the windowed aggregate counts") {
    val ea = EventAggregator.aggregate(Tables.events(spark, sf))
    val aggTotal = ea.agg(sum("event_count")).as[Long].head()
    val pivotTotal = Serving.pivotEventCounts(ea)
      .select(EventAggregator.defaultAllowed
        .map(t => col(s"${t}_count")).reduce(_ + _).as("s"))
      .agg(sum("s")).as[Long].head()
    assert(aggTotal == pivotTotal)
  }

  test("exact dedup cluster sizes account for every document") {
    val docs = Tables.documents(spark, sf)
    val total = graft.dedup.Dedup.exactDedup(docs)
      .agg(sum("dup_count")).as[Long].head()
    assert(total == docs.count())
  }

  test("salted distinct equals plain distinct per key") {
    val ev = Tables.events(spark, sf)
    val salted = Skew.saltedCountDistinct(ev, Seq("event_type"), "user_id")
      .as[(String, Long)].collect().toMap
    val plain = ev.groupBy("event_type").agg(countDistinct("user_id"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("event validation marks the full corpus valid (clean synthetic data)") {
    val v = Validator.validate(Tables.events(spark, sf))
    assert(v.filter(!$"is_valid").count() == 0)
  }
}
