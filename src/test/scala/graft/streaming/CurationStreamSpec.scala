package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming twin of the t29 composed-curation gate: documents arriving
  * in id-ordered micro-batches (and across a stream stop/restart) get
  * one quality → near-dup → budget decision each, and the accumulated
  * output is row-identical to the batch composition over the full
  * corpus.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val Budget = 800L

  private type Row7 = (Long, String, Long, Long, String, Option[Long], Option[Long])

  private def collect7(df: org.apache.spark.sql.DataFrame): Seq[Row7] =
    df.select($"doc_id", $"source", $"n_tokens", $"score", $"decision",
        $"dup_of", $"cum_tokens")
      .orderBy($"doc_id")
      .as[Row7].collect().toSeq

  private def runStream(
      drop: String, state1: String, state2: String, out: String, ckpt: String): Unit = {
    val q = CurationStream.run(spark, drop, state1, state2, out, ckpt, Budget)
    try assert(q.awaitTermination(240000), "stream did not finish within 240 s")
    finally q.stop()
  }

  test("stream over id-ordered drops equals the t29 batch curation, across a restart") {
    val dir = Files.createTempDirectory("curstream")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val tag = dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")
    val (st1, st2) = (s"curdedup_$tag", s"curbudget_$tag")

    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text").orderBy($"doc_id")
      .as[(Long, String, String)].collect()
    val cuts = Seq(0, docs.length / 3, 2 * docs.length / 3, docs.length)
    def jsonl(slice: Array[(Long, String, String)]): String =
      slice.toSeq.toDF("doc_id", "source", "text")
        .select(to_json(struct($"doc_id", $"source", $"text"))).as[String]
        .collect().mkString("", "\n", "\n")

    // Drop 1 alone, then stop; drops 2 and 3 land while the stream is
    // down — the restart serves them against persisted state.
    Files.writeString(drop.resolve("d1.jsonl"), jsonl(docs.slice(cuts(0), cuts(1))))
    runStream(drop.toString, st1, st2, out, ckpt)
    Files.writeString(drop.resolve("d2.jsonl"), jsonl(docs.slice(cuts(1), cuts(2))))
    Files.writeString(drop.resolve("d3.jsonl"), jsonl(docs.slice(cuts(2), cuts(3))))
    runStream(drop.toString, st1, st2, out, ckpt)

    val got = collect7(CurationStream.results(spark, out))
    val want = collect7(CurationStream.batchCuration(
      graft.Tables.documents(spark, sfDir), Budget))
    assert(want.map(_._1).distinct.size == docs.length, "one decision per doc")
    // all four decision classes must be live or the spec is weak
    val classes = want.map(_._5).toSet
    assert(classes == Set("admitted", "reject_quality", "reject_near_dup", "reject_budget"),
      s"decision classes degenerate: $classes")
    assert(got == want, "stream output diverged from batch curation")
  }

  test("replaying a micro-batch is idempotent after both state claims were written") {
    val dir = Files.createTempDirectory("curreplay")
    val out = dir.resolve("out").toString
    val tag = dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")
    val (st1, st2) = (s"curdedupr_$tag", s"curbudgetr_$tag")

    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text").orderBy($"doc_id")
    val b0 = docs.where($"doc_id" < 150)
    val b1 = docs.where($"doc_id" >= 150 && $"doc_id" < 300)
    CurationStream.processBatch(b0, 0L, st1, st2, out, Budget)
    CurationStream.processBatch(b1, 1L, st1, st2, out, Budget)
    val before = collect7(spark.read.parquet(out))

    CurationStream.processBatch(b1, 1L, st1, st2, out, Budget)
    val after = collect7(spark.read.parquet(out))
    assert(after == before, "replay changed the output")

    // state cardinality contracts: dedup state = one row per
    // (quality-passed doc, band); budget state = one row per
    // (source, batch)
    val ded = spark.table(st1)
    assert(ded.count() ==
      ded.select($"doc_id", $"band", $"batch").distinct().count())
    val bud = spark.table(st2)
    assert(bud.count() == bud.select($"source", $"batch").distinct().count())
  }
}
