package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-filter runtime semi-join reduction: with the thresholds sized
  * for local data, Catalyst's InjectRuntimeFilter plants a
  * bloom-filter probe on the fact side of a selective join — rows drop
  * before the shuffle — and the result stays identical to the
  * unfiltered join.
  */
class BloomRuntimeFilterSpec extends SparkSpec {

  test("selective dim join injects a bloom might_contain probe below the fact shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("bloomrf").toString
    spark.range(20000).select(
      col("id").as("fk"), (col("id") % 97).as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(200).select(
      col("id").as("k"), (col("id") % 10).as("tag"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", -1L)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", true)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", 0L)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    val fact = s2.read.parquet(s"$dir/fact")
    val dim = s2.read.parquet(s"$dir/dim").filter(col("tag") === 3)
    val joined = fact.join(dim, fact("fk") === dim("k"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(
      optimized.contains("might_contain") || optimized.contains("bloom_filter"),
      s"no bloom runtime filter in optimized plan:\n$optimized")
    // Reduction only, never a semantics change.
    assert(joined.count() == 20L)
  }
}
