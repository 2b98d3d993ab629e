package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Type, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types.TimestampType

/** Regression fixture for the TIMESTAMP(NANOS) events path — the dtype the
  * driver's testdata no longer ships (it regenerated to timestamp[us]
  * between rounds 6 and 9), so without a hand-written fixture the nanos
  * branch of [[Tables.events]] would be dead untested code that silently
  * rots. The fixture is written with parquet-hadoop's example writer (the
  * only way to produce TIMESTAMP(NANOS) on a stock Spark, which always
  * writes micros).
  *
  * Also pins the round-10 scoping fix: reading a nanos file must NOT leave
  * `spark.sql.legacy.parquet.nanosAsLong` set on the session — the flag is
  * needed only during relation creation, and a sticky set would leak into
  * any other reader of genuinely-nanos parquet in the session.
  */
class TablesNanosSpec extends SparkSpec {
  private val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Write a minimal events.parquet with ts as INT64 TIMESTAMP(NANOS). */
  private def writeNanosEvents(dir: java.io.File): Unit = {
    val schema: MessageType = Types
      .buildMessage()
      .addField(
        Types
          .primitive(PrimitiveTypeName.INT64, Type.Repetition.REQUIRED)
          .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
          .named("ts"))
      .addField(
        Types
          .primitive(PrimitiveTypeName.INT64, Type.Repetition.REQUIRED)
          .named("user_id"))
      .named("spark_schema")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter
      .builder(new Path(new java.io.File(dir, "part-0.parquet").getAbsolutePath))
      .withConf(conf)
      .withType(schema)
      .build()
    val gf = new SimpleGroupFactory(schema)
    (0 until 5).foreach { i =>
      val g = gf.newGroup()
      // 2023-11-14T22:13:20Z plus i seconds, in nanos.
      g.add("ts", 1700000000000000000L + i * 1000000000L)
      g.add("user_id", i.toLong)
      w.write(g)
    }
    w.close()
  }

  private def withNanosFixture(f: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft-nanos-events-").toFile
    try {
      val events = new java.io.File(root, "events.parquet")
      assert(events.mkdirs())
      writeNanosEvents(events)
      f(root.getAbsolutePath)
    } finally {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm))
        x.delete()
      }
      rm(root)
    }
  }

  test("events reads TIMESTAMP(NANOS) parquet and normalizes ts to TimestampType") {
    withNanosFixture { d =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType)
      // Nanos truncate to micros exactly (values are whole seconds here).
      val ts = df
        .selectExpr("CAST(ts AS STRING) AS s", "user_id")
        .orderBy("user_id")
        .collect()
        .map(_.getString(0))
      assert(ts.head == "2023-11-14 22:13:20")
      assert(ts.last == "2023-11-14 22:13:24")
    }
  }

  test("events does not leave nanosAsLong set on the session") {
    withNanosFixture { d =>
      spark.conf.unset(nanosKey)
      Tables.events(spark, d).count()
      assert(
        !spark.conf.getOption(nanosKey).contains("true"),
        s"$nanosKey leaked from Tables.events — the loader must set-and-restore")
    }
  }

  test("events restores a caller's explicit nanosAsLong value") {
    withNanosFixture { d =>
      spark.conf.set(nanosKey, "true")
      try {
        Tables.events(spark, d).count()
        assert(spark.conf.get(nanosKey) == "true")
      } finally spark.conf.unset(nanosKey)
    }
  }

  test("micros testdata still loads with the scoped flag (canary twin)") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory)
    spark.conf.unset(nanosKey)
    assert(Tables.events(spark, d).schema("ts").dataType == TimestampType)
    assert(!spark.conf.getOption(nanosKey).contains("true"))
  }
}
