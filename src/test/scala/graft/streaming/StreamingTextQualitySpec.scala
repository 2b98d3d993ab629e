package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.queries.TextQueries

/** st2's streaming half: the SAME aggregation body the gate pins in
  * batch (`TextQueries.streamQualityAgg`) runs as a readStream +
  * AvailableNow + complete-mode query over the documents parquet, and
  * the result must equal the batch gate row-for-row. Counts commute
  * with arrival order, so the equality is deterministic; the streaming
  * state is one row per lang — the smallest state a streaming
  * aggregate can carry.
  */
class StreamingTextQualitySpec extends SparkSpec {

  test("st2 streaming twin: readStream aggregation equals the batch gate") {
    val d = "/root/testdata/sf0.001"
    val schema = spark.read.parquet(s"$d/documents.parquet").schema

    // documents.parquet is a single file at the small scale factors;
    // the file stream source wants a directory, so stream the parent
    // dir with a glob pinned to the documents table.
    val streamed = TextQueries.streamQualityAgg(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(d))
    val q = streamed.writeStream
      .format("memory")
      .queryName("st2_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "stream did not finish within 120 s")
    finally q.stop()

    val got = spark.table("st2_stream").orderBy(col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = TextQueries.streamQuality.build(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(want.nonEmpty)
  }
}
