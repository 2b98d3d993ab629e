package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes `.explain("formatted")` of named gates to files — the
  * optimization-round plan evidence (`plans/r17/<gate>_<tag>.txt`).
  * Runs collect() first so AQE finalizes, then dumps BOTH the
  * formatted (pre-execution) plan and the final executed plan — the
  * formatted view carries PushedFilters/ReadSchema, the executed view
  * the AQE join/exchange decisions.
  *
  * Usage: runMain graft.tools.DumpPlans <sfDir> <outDir> <tag> <gate> [gate ...]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val gates = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    gates.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        val formatted = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val executed = df.queryExecution.executedPlan.toString()
        val body =
          s"== explain(formatted), gate $name, $sfDir ==\n" + formatted +
            "\n\n== executedPlan (AQE-final) ==\n" + executed
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          body.getBytes("UTF-8"))
        println(s"[plans] wrote $outDir/${name}_$tag.txt")
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
