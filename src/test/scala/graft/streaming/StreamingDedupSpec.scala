package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** In-stream exactly-once dedup ([[StreamingIngest.dedupedStream]] —
  * `dropDuplicatesWithinWatermark`): re-delivered receipts collapse
  * ACROSS micro-batches because the dedup keys live in the state store,
  * and the state survives a stream restart via the checkpoint. This is
  * the streaming twin of the V1/p19 read-side window — the batch gates
  * pin the read path, this spec pins the write path.
  */
class StreamingDedupSpec extends SparkSpec {

  private def receiptLine(num: String, ts: String, item: String, price: Double): String =
    s"""{"receipt_number":"$num","receipt_date":"$ts","created_at":"$ts","updated_at":"$ts","order":"Mesa 01","payments":[{"type":"CASH"}],"line_items":[{"item_name":"$item","cost":${price / 2},"price":$price,"total_money":$price,"line_modifiers":[]}]}"""

  private def runDedup(drop: String, out: String, ckpt: String): Unit = {
    val raw = StreamingIngest.rawStream(spark, drop, maxFilesPerTrigger = 1)
    val q = StreamingIngest.dedupedStream(raw)
      .select("receipt_number", "item_name", "price")
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    // awaitTermination returns false on timeout — assert it, else a slow
    // stream would surface as a confusing partial-output count mismatch
    // downstream instead of a clear timeout here.
    try assert(q.awaitTermination(120000), "stream did not finish within 120 s")
    finally q.stop()
  }

  test("cross-batch duplicate receipts collapse within the watermark") {
    val dir = Files.createTempDirectory("sdedup")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString

    // b1 and b2 are separate micro-batches (maxFilesPerTrigger = 1); the
    // r1/Burger re-delivery in b2 must hit the b1 state entry and drop.
    Files.writeString(drop.resolve("b1.jsonl"),
      receiptLine("r1", "2025-07-01T10:00:00Z", "Burger", 100.0) + "\n" +
        receiptLine("r2", "2025-07-01T11:00:00Z", "Fries", 50.0) + "\n")
    Files.writeString(drop.resolve("b2.jsonl"),
      receiptLine("r1", "2025-07-01T10:00:00Z", "Burger", 100.0) + "\n" +
        receiptLine("r3", "2025-07-01T12:00:00Z", "Malteada", 60.0) + "\n")

    runDedup(drop.toString, out, ckpt)
    val rows = spark.read.parquet(out)
    assert(rows.count() === 3, "r1 re-delivery dropped, r2/r3 kept")
    assert(rows.filter(col("receipt_number") === "r1").count() === 1)
  }

  test("dedup state survives a restart: late re-delivery is still dropped") {
    val dir = Files.createTempDirectory("sdedup2")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString

    Files.writeString(drop.resolve("b1.jsonl"),
      receiptLine("r1", "2025-07-01T10:00:00Z", "Burger", 100.0) + "\n" +
        receiptLine("r2", "2025-07-01T11:00:00Z", "Fries", 50.0) + "\n")
    runDedup(drop.toString, out, ckpt)
    assert(spark.read.parquet(out).count() === 2)

    // The stream is DOWN; a duplicate arrives (same event time, well
    // inside the 1-day watermark) plus a genuinely new receipt. On
    // restart the checkpointed state store still holds r1's key.
    Files.writeString(drop.resolve("b2.jsonl"),
      receiptLine("r1", "2025-07-01T10:00:00Z", "Burger", 100.0) + "\n" +
        receiptLine("r4", "2025-07-01T13:00:00Z", "Refresco", 30.0) + "\n")
    runDedup(drop.toString, out, ckpt)

    val rows = spark.read.parquet(out)
    assert(rows.count() === 3, "state recovered: r1 dropped again, r4 appended")
    assert(rows.filter(col("receipt_number") === "r1").count() === 1)
    // Same keys, different item → NOT a duplicate (key is (number, item)).
    Files.writeString(drop.resolve("b3.jsonl"),
      receiptLine("r1", "2025-07-01T10:05:00Z", "Fries", 45.0) + "\n")
    runDedup(drop.toString, out, ckpt)
    assert(spark.read.parquet(out).count() === 4, "different item on r1 passes")
  }
}
