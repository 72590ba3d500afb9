package graft


/** Dev helper: time a subset of queries (args = query names; repeats
  * with `-n N`). Same session shape as [[Bench]]. Not driver-facing.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val (reps, names) = args.toList match {
      case "-n" :: n :: rest => (n.toInt, rest)
      case rest              => (1, rest)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.sessionBuilder(Engine.envCores(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000).groupBy(org.apache.spark.sql.functions.expr("id % 7"))
      .count().write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[bench-one] rep$r $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
