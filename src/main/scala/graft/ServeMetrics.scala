package graft

import graft.operators.MetricsStore

/** Serving read CLI — the analog of the reference cache service's read
  * endpoints (GET /metrics/overview, /metrics/event/windows?limit=N)
  * against the metric tables written by [[RunPipelines]].
  *
  * Usage: runMain graft.ServeMetrics <metricsDir> [limit]
  */
object ServeMetrics {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val limit = if (args.length > 1) args(1).toInt else 20
    val spark = Engine.sessionBuilder(Engine.envCores(8)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = new MetricsStore(spark, path)
    println(s"[serve] overview:")
    store.overview.show(truncate = false)
    println(s"[serve] newest $limit windows:")
    store.windows(limit).show(limit, truncate = false)
    spark.stop()
  }
}
