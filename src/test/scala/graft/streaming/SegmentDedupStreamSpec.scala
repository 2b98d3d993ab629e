package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextOps

/** Streaming twin of the t18 segment-dedup gate: documents arriving
  * across micro-batches (and across a stream stop/restart) dedup their
  * segments against the persistent state table, and the accumulated
  * output is row-identical to the batch gate's keep-first replay over
  * the full corpus — stream ≡ batch, the incremental-curation contract.
  */
class SegmentDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  /** One 10-token segment built from a marker word — segment boundaries
    * in the 10-token grid are exact, so dedup decisions are by design.
    */
  private def seg(w: String): String = (1 to 10).map(i => s"$w$i").mkString(" ")
  private val A = seg("a"); private val B = seg("b"); private val C = seg("c")
  private val D = seg("d"); private val E = seg("e")

  // doc 0: A B   (batch 0)    → both kept
  // doc 1: B C   (batch 0)    → B dropped within the batch, C kept
  // doc 2: A D   (batch 1)    → A dropped ACROSS THE RESTART via state
  // doc 3: D E E (batch 1)    → D dropped (doc 2 claimed it earlier in
  //                             the same batch), first E kept, repeat E
  //                             dropped within the doc
  private val docs = Seq(
    0L -> s"$A $B", 1L -> s"$B $C", 2L -> s"$A $D", 3L -> s"$D $E $E")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def jline(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""

  private def runStream(drop: String, state: String, out: String, ckpt: String): Unit = {
    val q = SegmentDedupStream.run(spark, drop, state, out, ckpt)
    try assert(q.awaitTermination(120000), "stream did not finish within 120 s")
    finally q.stop()
  }

  test("stream equals batch replay across a stop/restart") {
    val dir = Files.createTempDirectory("segstream")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val state = s"segstate_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    Files.writeString(drop.resolve("f1.jsonl"),
      jline(0, docs(0)._2) + "\n" + jline(1, docs(1)._2) + "\n")
    runStream(drop.toString, state, out, ckpt)

    // The stream is DOWN; a new drop arrives whose segments overlap
    // batch 0's. On restart the state table must still hold A/B/C.
    Files.writeString(drop.resolve("f2.jsonl"),
      jline(2, docs(2)._2) + "\n" + jline(3, docs(3)._2) + "\n")
    runStream(drop.toString, state, out, ckpt)

    val got = spark.read.parquet(out)
      .select($"doc_id", $"n_segs", $"n_dropped", $"clean_fp")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

    // Hand-pinned counts + exact cleaned-text fingerprints.
    assert(got == Seq(
      (0L, 2L, 0L, md5hex(s"$A $B")),
      (1L, 2L, 1L, md5hex(C)),
      (2L, 2L, 1L, md5hex(D)),
      (3L, 3L, 2L, md5hex(E))))

    // Stream ≡ batch: the t18 body (same TextOps functions) over the
    // union of everything that ever arrived.
    val all = docs.toDF("doc_id", "text")
    val segs = TextOps.docSegments(all)
    val keep = segs.groupBy($"h").agg(min($"occ").as("keeper"))
    val batch = TextOps.assembleSegmentDedup(segs.join(keep, Seq("h")))
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == batch, "stream output diverged from batch replay")
  }

  test("replaying a micro-batch is idempotent after its state was written") {
    val dir = Files.createTempDirectory("segreplay")
    val out = dir.resolve("out").toString
    val state = s"segreplay_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    val b0 = Seq(0L -> s"$A $B", 1L -> s"$B $C").toDF("doc_id", "text")
    val b1 = Seq(2L -> s"$A $D", 3L -> s"$D $E $E").toDF("doc_id", "text")
    SegmentDedupStream.processBatch(b0, 0L, state, out)
    SegmentDedupStream.processBatch(b1, 1L, state, out)
    val before = spark.read.parquet(out)
      .select($"doc_id", $"n_segs", $"n_dropped", $"clean_fp")
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq

    // foreachBatch redelivers batch 1 after a crash that happened AFTER
    // its state partition landed — the replay must read only batch < 1
    // state (partition-pruned) and overwrite its own outputs exactly.
    SegmentDedupStream.processBatch(b1, 1L, state, out)
    val after = spark.read.parquet(out)
      .select($"doc_id", $"n_segs", $"n_dropped", $"clean_fp")
      .orderBy($"doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(after == before, "replay changed the output")

    // State partition was overwritten, not appended: one row per hash.
    val st = spark.table(state).where($"batch" === 1L)
    assert(st.count() == st.select($"h").distinct().count())
  }
}
