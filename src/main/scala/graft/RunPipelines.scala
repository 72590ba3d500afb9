package graft

import graft.streaming.Pipelines

/** Streaming job coordinator CLI — the analog of the reference's
  * processing service entrypoint (services/processing/src/main.py:13-37):
  * one source, three streaming aggregation pipelines, three sinks.
  *
  * Usage: runMain graft.RunPipelines <eventsDir> <outDir> [servePort]
  * Runs with Trigger.AvailableNow (process everything, then stop) so it
  * doubles as a batch backfill of the metric tables; swap the trigger for
  * continuous operation. With a third `servePort` argument the cache
  * HTTP surface ([[graft.serving.MetricsHttpServer]]) starts on that
  * port, snapshot-refreshed per micro-batch — the reference's
  * processing + cache services in one process.
  */
object RunPipelines {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val spark = Engine.sessionBuilder(Engine.envCores(8)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-trigger telemetry next to the metric tables (the reference
    // exports Prometheus counters; this is the engine's flight recorder)
    val listener = graft.streaming.Observability.attach(spark, s"$outDir/_progress")
    val server = args.lift(2).map(_.toInt).map { p =>
      val s = new graft.serving.MetricsHttpServer(
        new graft.operators.MetricsStore(spark, outDir), p)
      val port = s.start()
      val l = s.attachAutoRefresh(spark)
      println(s"[pipelines] serving metrics at http://127.0.0.1:$port/metrics")
      (s, l)
    }
    val queries = Pipelines.runAll(spark, srcDir, outDir)
    queries.foreach(_.awaitTermination())
    graft.streaming.Observability.detach(spark, listener)
    server.foreach { case (s, l) => s.detachAutoRefresh(spark, l); s.stop() }
    Seq("event_metrics", "session_metrics", "performance_metrics").foreach { t =>
      val n = spark.read.parquet(s"$outDir/$t").count()
      println(s"[pipelines] $t rows=$n")
    }
    val lag = new graft.operators.MetricsStore(spark, outDir)
      .watermarkLag(s"$outDir/_progress")
      .groupBy("query_name").agg(org.apache.spark.sql.functions.min("lag_ms"))
      .collect()
    println(s"[pipelines] watermark lag (ms, newest): ${lag.mkString(", ")}")
    spark.stop()
  }
}
