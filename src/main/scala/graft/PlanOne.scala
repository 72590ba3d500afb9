package graft

/** Print the formatted physical plan of one SparkEntry query — the
  * .explain feedback loop as a main: `runMain graft.PlanOne <sfDir> <q>`. */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Engine.sessionBuilder(8).getOrCreate()
    try args.drop(1).foreach { q =>
      println(s"=== $q ===")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    } finally spark.stop()
  }
}
