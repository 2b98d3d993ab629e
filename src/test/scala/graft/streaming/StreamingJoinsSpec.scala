package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream interval join: in-window pairs match, out-of-window
  * don't, and agreement with the batch keyed range join on the same
  * data.
  */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("watermarked interval join matches in-window pairs only and agrees with batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val buys = MemoryStream[(Long, Timestamp, Long)]
    val out = StreamingJoins.intervalJoin(
      clicks.toDF().toDF("user_id", "ts", "click_id"),
      buys.toDF().toDF("user_id", "ts", "buy_id"),
      keyCol = "user_id", timeCol = "ts", windowSpec = "1 hour")
      .selectExpr("click_id", "r_buy_id AS buy_id")
    val q = out.writeStream.format("memory").queryName("conv").outputMode("append").start()

    clicks.addData((1L, t(0), 100L), (1L, t(10), 101L), (2L, t(0), 200L))
    buys.addData(
      (1L, t(30), 900L), // within 1h of both clicks of user 1
      (1L, t(65), 901L), // within 1h of click 101 (55 min) but not click 100 (65 min)
      (2L, t(90), 902L)) // outside user 2's click window
    q.processAllAvailable()
    q.stop()
    val got = spark.table("conv").as[(Long, Long)].collect().toSet
    val expected = Set((100L, 900L), (101L, 900L), (101L, 901L))
    assert(got == expected)

    // Batch replay through the keyed range join agrees.
    val M = 60L * 1000000L
    val cb = Seq((1L, 0L * M, 100L), (1L, 10L * M, 101L), (2L, 0L * M, 200L))
      .toDF("user_id", "tus", "click_id")
    val bb = Seq((1L, 30L * M, 900L), (1L, 65L * M, 901L), (2L, 90L * M, 902L))
      .toDF("p_user_id", "p_tus", "buy_id")
    val batch = graft.operators.RangeJoin
      .keyedWindowJoin(cb, bb, "user_id", "p_user_id", "tus", "p_tus", 60L * M)
      .select("click_id", "buy_id").as[(Long, Long)].collect().toSet
    assert(batch == expected)
  }
}
