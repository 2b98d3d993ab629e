package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming twin of the m10 online near-dup gate: documents arriving
  * in id-ordered micro-batches (and across a stream stop/restart) are
  * admitted against the persistent banded-bucket state table, and the
  * accumulated (doc_id, dup_of) output is row-identical to the batch
  * gate over the full corpus — stream ≡ batch, the ingestion-time
  * dedup contract.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def runStream(drop: String, state: String, out: String, ckpt: String): Unit = {
    val q = NearDupStream.run(spark, drop, state, out, ckpt)
    try assert(q.awaitTermination(180000), "stream did not finish within 180 s")
    finally q.stop()
  }

  test("stream over id-ordered drops equals the m10 batch gate") {
    val dir = Files.createTempDirectory("neardupstream")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val state = s"ndstate_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    // Three id-ordered JSONL drops covering the full sf0.001 corpus.
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy($"doc_id")
      .as[(Long, String)].collect()
    val cuts = Seq(0, docs.length / 3, 2 * docs.length / 3, docs.length)
    def jsonl(slice: Array[(Long, String)]): String = {
      val df = slice.toSeq.toDF("doc_id", "text")
      df.select(to_json(struct($"doc_id", $"text"))).as[String]
        .collect().mkString("", "\n", "\n")
    }

    // Drop 1 alone, then stop; drops 2 and 3 land while the stream is
    // down — the restart must serve them against persisted state.
    Files.writeString(drop.resolve("d1.jsonl"), jsonl(docs.slice(cuts(0), cuts(1))))
    runStream(drop.toString, state, out, ckpt)
    Files.writeString(drop.resolve("d2.jsonl"), jsonl(docs.slice(cuts(1), cuts(2))))
    Files.writeString(drop.resolve("d3.jsonl"), jsonl(docs.slice(cuts(2), cuts(3))))
    runStream(drop.toString, state, out, ckpt)

    val got = NearDupStream.results(spark, out)
      .orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    val want = graft.queries.DedupQueries.onlineNearDup
      .build(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(want.nonEmpty, "batch gate is empty at sf0.001 — spec would be vacuous")
    assert(got == want, "stream output diverged from the m10 batch gate")
  }

  test("replaying a micro-batch is idempotent after its state was written") {
    val dir = Files.createTempDirectory("neardupreplay")
    val out = dir.resolve("out").toString
    val state = s"ndreplay_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy($"doc_id").limit(200)
    val b0 = docs.where($"doc_id" < 100)
    val b1 = docs.where($"doc_id" >= 100)
    NearDupStream.processBatch(b0, 0L, state, out, 8, 2, 4)
    NearDupStream.processBatch(b1, 1L, state, out, 8, 2, 4)
    val before = spark.read.parquet(out)
      .select($"doc_id", $"dup_of").orderBy($"doc_id")
      .as[(Long, Long)].collect().toSeq

    // foreachBatch redelivers batch 1 after a crash that happened AFTER
    // its state partition landed — replay reads only batch < 1 state
    // and overwrites its own partition and output exactly.
    NearDupStream.processBatch(b1, 1L, state, out, 8, 2, 4)
    val after = spark.read.parquet(out)
      .select($"doc_id", $"dup_of").orderBy($"doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(after == before, "replay changed the output")

    // State partition was overwritten, not appended: one row per
    // (doc, band).
    val st = spark.table(state).where($"batch" === 1L)
    assert(st.count() == st.select($"doc_id", $"band").distinct().count())
  }
}
