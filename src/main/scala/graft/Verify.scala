package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev convenience: extra args = run only these queries (driver passes 2)
    val only = args.drop(2).toSet
    val spark = Engine.sessionBuilder(Engine.envCores(4)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // per-query dump seconds + row counts, shipped beside oracle_sql.json
    // so an empty/partial driver correctness artifact can be attributed
    // from the repo side alone (r14's came back {} with zero repo-side
    // evidence of which phase died)
    val meta = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val sec = (System.nanoTime() - t0) / 1e9
        // footer-metadata count on the single just-written file: cheap.
        // Its OWN try (ADVICE r15): the parquet is already on disk and
        // compare.py can still validate it, so a count failure records
        // the healthy dump time with rows=-1 instead of marking the
        // whole query dead
        val rows =
          try spark.read.parquet(s"$outDir/$name").count()
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name row-count re-read failed " +
              s"(dump itself succeeded): ${e.getMessage}")
            -1L
          }
        meta(name) = (sec, rows)
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        meta(name) = (-1.0, -1L)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val metaJson = meta
      .map { case (k, (sec, rows)) =>
        // Double.toString is locale-independent (f"%.3f" is not)
        s"${q(k)}: {\"sec\": ${math.round(sec * 1000) / 1000.0}, \"rows\": $rows}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"), metaJson)
    spark.stop()
  }
}
