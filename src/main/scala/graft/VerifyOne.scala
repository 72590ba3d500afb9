package graft
import java.nio.file.{Files, Paths}
/** Targeted correctness dump: like [[Verify]] but only the named
  * queries — the fast iteration loop when adding an operator
  * (`runMain graft.VerifyOne <sfDir> <outDir> q_a q_b ...`). */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = Engine.sessionBuilder(Engine.envCores(4)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      Files.writeString(Paths.get(s"$outDir/$name.sql"),
        SparkEntry.oracleSql.getOrElse(name, ""))
      println(s"[verify-one] wrote $name")
    }
    spark.stop()
  }
}
