package graft

import graft.streaming.Pipelines

/** Streaming job coordinator CLI — the analog of the reference's
  * processing service entrypoint (services/processing/src/main.py:13-37):
  * one source, three streaming aggregation pipelines, three sinks.
  *
  * Usage: runMain graft.RunPipelines <eventsDir> <outDir>
  * Runs with Trigger.AvailableNow (process everything, then stop) so it
  * doubles as a batch backfill of the metric tables; swap the trigger for
  * continuous operation.
  */
object RunPipelines {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir) = args.take(2)
    val spark = Engine.sessionBuilder(Engine.envCores(8)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = Pipelines.runAll(spark, srcDir, outDir)
    queries.foreach(_.awaitTermination())
    Seq("event_metrics", "session_metrics", "performance_metrics").foreach { t =>
      val n = spark.read.parquet(s"$outDir/$t").count()
      println(s"[pipelines] $t rows=$n")
    }
    spark.stop()
  }
}
