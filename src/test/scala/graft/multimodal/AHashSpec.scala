package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Average-hash through the real PNG decode vs a direct computation
  * from the analytic raster, plus the sentinel contract.
  */
class AHashSpec extends SparkSpec {
  import spark.implicits._

  /** Reference aHash from the raster formula — no codec involved. */
  private def refHash(docId: Long): (Long, Long) = {
    val w = Multimodal.imgWidth(docId); val h = Multimodal.imgHeight(docId)
    val cs = new Array[Long](64); val cn = new Array[Long](64)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val b = (y * 8 / h) * 8 + (x * 8 / w)
      val v = Multimodal.imgPixel(docId)(x, y).toLong
      cs(b) += v; cn(b) += 1; total += v
    }
    val npx = w.toLong * h
    var lo = 0L; var hi = 0L
    for (b <- 0 until 64 if cs(b) * npx > total * cn(b))
      if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
    (hi, lo)
  }

  test("aHash through PNG encode/decode equals the analytic reference") {
    val docs = Seq((0L, "x", "s"), (7L, "x", "s"), (23L, "x", "s"), (100L, "x", "s"))
      .toDF("doc_id", "text", "source")
    val got = Multimodal.imageAHash(Multimodal.fromDocuments(docs))
      .select($"asset_id", $"hash_hi", $"hash_lo")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got.foreach { case (id, hash) =>
      assert(hash == refHash(id), s"asset $id")
    }
    // halves are non-negative 32-bit values (no sign-wrap ambiguity)
    got.values.foreach { case (hi, lo) =>
      assert(hi >= 0 && hi < (1L << 32) && lo >= 0 && lo < (1L << 32))
    }
  }

  /** Reference audio hash from the signal formula — codec-free. */
  private def refAudioHash(docId: Long): (Long, Long) = {
    val n = Multimodal.wavChannels(docId) * Multimodal.wavSamples(docId)
    val ws = new Array[Long](64); val wc = new Array[Long](64)
    var total = 0L
    for (i <- 0 until n) {
      val w = (i.toLong * 64 / n).toInt
      val v = math.abs(((i * 7L + docId) % 65536) - 32768)
      ws(w) += v; wc(w) += 1; total += v
    }
    var lo = 0L; var hi = 0L
    for (b <- 0 until 64 if ws(b) * n > total * wc(b))
      if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
    (hi, lo)
  }

  test("audio aHash through WAV encode/decode equals the analytic reference") {
    val docs = Seq((0L, "x", "s"), (3L, "x", "s"), (251L, "x", "s"))
      .toDF("doc_id", "text", "source")
    Multimodal.audioAHash(Multimodal.fromDocumentsWav(docs))
      .select($"asset_id", $"hash_hi", $"hash_lo")
      .as[(Long, Long, Long)].collect()
      .foreach { case (id, hi, lo) => assert((hi, lo) == refAudioHash(id), s"asset $id") }
  }

  test("undecodable payload yields the sentinel row") {
    val junk = Seq((1L, Array[Byte](1, 2, 3))).toDF("asset_id", "content")
    val out = Multimodal.imageAHash(junk).collect().head
    assert(out.getAs[Int]("width") == -1)
    assert(out.getAs[Long]("hash_hi") == -1L)
  }
}
