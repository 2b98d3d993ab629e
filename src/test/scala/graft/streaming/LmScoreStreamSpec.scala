package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming twin of the t33 LM-perplexity gate: documents arriving in
  * micro-batches (and across a stream stop/restart, in a fresh-catalog
  * JVM sense via the MSCK-re-adoptable LM table) are scored against
  * the FROZEN trigram LM, and the accumulated output is row-identical
  * to the batch scoring over the full corpus.
  */
class LmScoreStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  // Admit iff avg nats/token ≤ 4.4 (the sf0.001 corpus median is
  // ~4.34, max ~4.93) — both decision classes live, asserted below.
  private val ThresholdMicro = 4400000L

  private def runStream(drop: String, lmTable: String, out: String,
                        ckpt: String): Unit = {
    val q = LmScoreStream.run(spark, drop, lmTable, out, ckpt, ThresholdMicro)
    try assert(q.awaitTermination(180000), "stream did not finish within 180 s")
    finally q.stop()
  }

  test("stream over drops equals batch scoring under the frozen LM") {
    val dir = Files.createTempDirectory("lmstream")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val lmTable = s"lmtab_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text").orderBy($"doc_id")
      .as[(Long, String, String)].collect()
    LmScoreStream.freezeLm(spark,
      graft.Tables.documents(spark, sfDir).where($"source" === "src0"),
      "doc_id", "text", lmTable)

    val cuts = Seq(0, docs.length / 3, 2 * docs.length / 3, docs.length)
    def jsonl(slice: Array[(Long, String, String)]): String =
      slice.toSeq.toDF("doc_id", "source", "text")
        .select(to_json(struct($"doc_id", $"source", $"text"))).as[String]
        .collect().mkString("", "\n", "\n")

    // Drop 1, stop; drops 2+3 land while the stream is down — the
    // restart scores them against the re-loaded frozen LM.
    Files.writeString(drop.resolve("d1.jsonl"), jsonl(docs.slice(cuts(0), cuts(1))))
    runStream(drop.toString, lmTable, out, ckpt)
    Files.writeString(drop.resolve("d2.jsonl"), jsonl(docs.slice(cuts(1), cuts(2))))
    Files.writeString(drop.resolve("d3.jsonl"), jsonl(docs.slice(cuts(2), cuts(3))))
    runStream(drop.toString, lmTable, out, ckpt)

    val got = LmScoreStream.results(spark, out)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    val want = LmScoreStream
      .batchScores(graft.Tables.documents(spark, sfDir),
        LmScoreStream.loadLm(spark, lmTable), ThresholdMicro)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got == want, "stream output diverged from batch scoring")
    val decisions = want.map(_._7).toSet
    assert(decisions == Set("admitted", "reject_perplexity"),
      s"threshold did not split the corpus: $decisions")
  }

  test("refreezing the LM is idempotent; the frozen LM matches train()") {
    val dir = Files.createTempDirectory("lmfreeze")
    val lmTable = s"lmfrz_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"
    val ref = graft.Tables.documents(spark, sfDir).where($"source" === "src0")
    LmScoreStream.freezeLm(spark, ref, "doc_id", "text", lmTable)
    val once = spark.table(lmTable).orderBy($"kind", $"t1", $"t2", $"t3")
      .collect().toSeq
    LmScoreStream.freezeLm(spark, ref, "doc_id", "text", lmTable)
    val twice = spark.table(lmTable).orderBy($"kind", $"t1", $"t2", $"t3")
      .collect().toSeq
    assert(once == twice, "refreeze changed the frozen LM")

    val lm = graft.text.NgramLm.train(ref, "doc_id", "text")
    val loaded = LmScoreStream.loadLm(spark, lmTable)
    assert(loaded.nTokens == lm.nTokens && loaded.vocab == lm.vocab)
    assert(loaded.tri.count() == lm.tri.count() &&
      loaded.bi.count() == lm.bi.count() && loaded.uni.count() == lm.uni.count())
  }
}
