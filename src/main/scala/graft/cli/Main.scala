package graft.cli

import java.nio.file.Paths
import org.apache.spark.sql.SparkSession
import graft.pos.Pipeline

/** CLI orchestrator — the same six step verbs as the reference's
  * `main.py:100-105` (`daily_run, full_extract, load_historical,
  * monthly_report, cumulative_report, report`).
  *
  * Usage:
  *   Main --step daily_run --base-url http://… --lake /path/lake
  *        [--state /path/etl_state.json] [--raw /path/raw]
  *        [--reports /path/reports] [--api-key K]
  *        [--report-month yyyy-MM --comparison-month yyyy-MM]
  *        [--raw-path /path/receipts.jsonl]
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("--") =>
      k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val validSteps = Set("daily_run", "full_extract", "load_historical",
      "monthly_report", "cumulative_report", "report", "compact")
    val step = opts.getOrElse("step",
      sys.error(s"--step required: ${validSteps.mkString("|")}"))
    // Fail fast on bad args BEFORE paying the Spark session startup.
    if (!validSteps(step)) sys.error(s"unknown --step '$step' (expected ${validSteps.mkString("|")})")
    if (Set("monthly_report", "report")(step)) {
      opts.getOrElse("report-month", sys.error("--report-month required"))
      opts.getOrElse("comparison-month", sys.error("--comparison-month required"))
    }
    val cfg = Pipeline.Config(
      baseUrl = opts.getOrElse("base-url", "http://localhost:8080"),
      apiKey = opts.getOrElse("api-key", ""),
      lakeRoot = opts.getOrElse("lake", "data/lake"),
      statePath = Paths.get(opts.getOrElse("state", "config/etl_state.json")),
      rawDir = Paths.get(opts.getOrElse("raw", "data/raw")),
      reportDir = Paths.get(opts.getOrElse("reports", "reports")),
      pageDelayMs = opts.get("page-delay-ms").map(_.toLong).getOrElse(500L))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("pos-engine")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try step match {
      case "daily_run" =>
        val wrote = Pipeline.dailyRun(spark, cfg)
        println(if (wrote) "daily_run: new data appended" else "daily_run: no new data")
      case "full_extract" =>
        println(s"full_extract: ${Pipeline.fullExtract(spark, cfg)} receipts saved")
      case "load_historical" =>
        Pipeline.loadHistorical(spark, cfg,
          opts.getOrElse("raw-path", cfg.rawDir.resolve("receipts_historical").toString))
        println("load_historical: lake written")
      case "monthly_report" =>
        val rm = opts.getOrElse("report-month", sys.error("--report-month required"))
        val cm = opts.getOrElse("comparison-month", sys.error("--comparison-month required"))
        Pipeline.monthlyReport(spark, cfg, rm, cm)
        println(s"monthly_report: written to ${cfg.reportDir}")
      case "cumulative_report" =>
        Pipeline.cumulativeReport(spark, cfg)
        println(s"cumulative_report: written to ${cfg.reportDir}")
      case "compact" =>
        val target = opts.getOrElse("compact-target", cfg.lakeRoot + "_compacted")
        graft.pos.Lake.compactTo(spark, cfg.lakeRoot, target)
        println(s"compact: deduplicated lake written to $target")
      case "report" =>
        val rm = opts.getOrElse("report-month", sys.error("--report-month required"))
        val cm = opts.getOrElse("comparison-month", sys.error("--comparison-month required"))
        Pipeline.monthlyReport(spark, cfg, rm, cm)
        Pipeline.cumulativeReport(spark, cfg)
        println(s"report: both written to ${cfg.reportDir}")
      case other => sys.error(s"unknown --step '$other'")
    } finally spark.stop()
  }
}
