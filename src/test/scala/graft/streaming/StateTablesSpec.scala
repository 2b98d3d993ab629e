package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The state-table discipline's durability contract: a fresh catalog
  * (new JVM, default in-memory metastore) must RE-ADOPT state data a
  * previous JVM left in the warehouse — not wipe it. A wiped state
  * table while the stream checkpoint still skips completed batches is
  * the one combination that over-admits.
  */
class StateTablesSpec extends SparkSpec {
  import spark.implicits._

  test("ensure() adopts pre-existing partition data instead of deleting it") {
    val name = s"adopt_${System.nanoTime()}"
    // a "previous JVM": state data already in the warehouse location,
    // no catalog entry for it
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase).toString
    Seq(("news", 120L)).toDF("source", "seen_tokens")
      .write.parquet(s"$loc/batch=0")
    Seq(("news", 80L), ("web", 44L)).toDF("source", "seen_tokens")
      .write.parquet(s"$loc/batch=1")
    assert(!spark.catalog.tableExists(name))

    StateTables.ensure(spark, name, "source STRING, seen_tokens BIGINT, batch BIGINT")

    val rows = spark.table(name)
      .select($"source", $"seen_tokens", $"batch")
      .orderBy($"batch", $"source")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows == Seq(("news", 120L, 0L), ("news", 80L, 1L), ("web", 44L, 1L)),
      s"adopted state wrong: $rows")

    // and the base computation a replayed batch would run sees history
    val base = spark.table(name).where($"batch" < 1)
      .groupBy($"source").agg(sum($"seen_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    assert(base == Map("news" -> 120L))
  }
}
