package graft

import org.apache.spark.sql.types.{LongType, TimestampType}

/** Schema-drift canary: every `Tables` accessor must ANALYZE against every
  * sf dir the driver generates. The round-7/8 outage — the driver
  * regenerated `events.parquet` with `ts` as timestamp[us] and the loader's
  * TIMESTAMP(NANOS) workaround stopped analyzing — would have been one red
  * spec here instead of 14 silently-dropped gates and a crashed bench.
  * `.schema` forces analysis without reading data, so the full sweep costs
  * milliseconds.
  */
class TablesCanarySpec extends SparkSpec {
  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).isDirectory)

  private val accessors: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "lineitem" -> (Tables.lineitem _), "orders" -> (Tables.orders _),
      "customer" -> (Tables.customer _), "supplier" -> (Tables.supplier _),
      "part" -> (Tables.part _), "nation" -> (Tables.nation _),
      "region" -> (Tables.region _), "events" -> (Tables.events _),
      "documents" -> (Tables.documents _), "embeddings" -> (Tables.embeddings _))

  test("testdata dirs exist") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs found")
  }

  for (dir <- sfDirs; (name, load) <- accessors)
    test(s"$name analyzes against $dir") {
      val schema = load(spark, dir).schema // forces analysis
      assert(schema.fields.nonEmpty)
    }

  for (dir <- sfDirs)
    test(s"events.ts normalizes to TimestampType against $dir") {
      // Every events consumer (windows, as-of joins, watermarks, the DuckDB
      // oracles) assumes one canonical dtype regardless of how the parquet
      // stores ts (NANOS, us, or ScaleUp's BIGINT nanos).
      val t = Tables.events(spark, dir).schema("ts").dataType
      assert(t == TimestampType, s"events.ts is $t, expected TimestampType")
      assert(t != LongType)
    }
}
