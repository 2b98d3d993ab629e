package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Scale-stress harness: time the named gate queries on a (derived)
  * dataset and log per-query SHUFFLE volume — the number that predicts
  * cluster behavior better than local wall clock. A stage listener
  * accumulates shuffle read/write bytes between query start and end
  * (queries run serially, so attribution is exact).
  *
  * Usage: runMain graft.tools.StressBench <sfDir> <query...>
  * Output: one JSON line per query
  *   {"query":…,"sec":…,"shuffle_write_mb":…,"shuffle_read_mb":…,"rows":…}
  */
object StressBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val write = new AtomicLong
    val read = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        write.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })

    // SPARK_GRAFT_STRESS_COLD=1 skips the warm-up pass so the timed run
    // is the COLD path — including the battery-shared memo derivations
    // (span index, PQ codebook), which the warm-up would otherwise
    // populate. Use one gate per JVM in this mode (the memos are
    // process-wide).
    val cold = sys.env.getOrElse("SPARK_GRAFT_STRESS_COLD", "0") == "1"
    val queries = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = queries.getOrElse(name, sys.error(s"unknown query $name"))
      // warm-up pass (codegen/JIT) — not billed
      if (!cold) { try fn(spark, sfDir).count() catch { case _: Throwable => () } }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      write.set(0); read.set(0)
      val t0 = System.nanoTime()
      val rows = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async (and the bus is private API) — give
      // the queue a moment to drain before reading the counters
      Thread.sleep(1000)
      println(f"""{"query":"$name","sec":$sec%.3f,"shuffle_write_mb":${write.get / 1e6}%.1f,"shuffle_read_mb":${read.get / 1e6}%.1f,"rows":$rows,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
