package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextOps

/** Streaming twin of the t42 corpus-level line dedup: arrivals' long
  * lines are admitted against the frozen line-digest census (lines the
  * corpus already keeps are cut, bit-identically across restart and
  * replay; batch-local keep-first among the genuinely new), repeats
  * across batches pass admission and are caught by the next rebuild,
  * whose output IS the batch operator over the accumulated corpus —
  * the exactness contract `LineDedupStream`'s scaladoc states.
  */
class LineDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val MC = 30

  private val boiler = "GLOBAL FOOTER LINE REPEATED ON EVERY PAGE OK"
  private val base = Seq(
    (0L, s"$boiler\nbase body zero unique line long enough yes"),
    (1L, s"base body one unique line long enough indeed\n$boiler"),
    (2L, "short"))

  private def runStream(drop: String, state: String, out: String,
                        ckpt: String): Unit = {
    val q = LineDedupStream.run(spark, drop, state, out, ckpt, MC)
    try assert(q.awaitTermination(180000), "stream did not finish within 180 s")
    finally q.stop()
  }

  private def jsonl(slice: Seq[(Long, String)]): String =
    slice.toDF("doc_id", "text")
      .select(to_json(struct($"doc_id", $"text"))).as[String]
      .collect().mkString("", "\n", "\n")

  test("admission cuts frozen lines, keeps-first batch-locally; rebuild == batch") {
    val dir = Files.createTempDirectory("linededup")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val clean = dir.resolve("clean").toString
    val ckpt = dir.resolve("ckpt").toString
    val state = s"linededup_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    // rebuild 0 over the base corpus IS the batch operator
    LineDedupStream.rebuildCompact(
      spark, base.toDF("doc_id", "text"), state, clean, rebuildId = 0L, minChars = MC)
    val cleanedBase = spark.read.parquet(s"$clean/rebuild=0")
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().sortBy(_._1)
    val batchWant = TextOps.dedupLines(base.toDF("doc_id", "text"), "doc_id", "text", MC)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().sortBy(_._1)
    assert(cleanedBase.toSeq == batchWant.toSeq)
    // doc 0 (first) keeps the boilerplate; doc 1 loses exactly it
    assert(cleanedBase(0)._2.startsWith(boiler))
    assert(cleanedBase(1)._2 == "base body one unique line long enough indeed")

    // batch A: doc 10 repeats the frozen boilerplate (cut at admission,
    // short tail survives); doc 11 repeats a NEW long line twice within
    // the batch (keep-first batch-locally keeps only ln = 0)
    val repeatNew = "NEW REPEATED ARRIVAL LINE LONG ENOUGH HERE"
    val batchA = Seq(
      (10L, s"$boiler\narrival ten brand new body line long enough\nok"),
      (11L, s"$repeatNew\nmiddle arrival body line long enough here\n$repeatNew"))
    Files.writeString(drop.resolve("a.jsonl"), jsonl(batchA))
    runStream(drop.toString, state, out, ckpt)
    val afterA = LineDedupStream.results(spark, out)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(afterA(10L)._4 == "arrival ten brand new body line long enough\nok")
    assert(afterA(10L)._2 == 3 && afterA(10L)._3 == 2)
    assert(afterA(11L)._4 ==
      s"$repeatNew\nmiddle arrival body line long enough here")

    // batch B: doc 12 repeats doc 11's new line — the frozen census has
    // never seen it, so it PASSES admission (over-retained by contract)
    val batchB = Seq((12L, s"$repeatNew\ntrailing body of doc twelve long enough"))
    Files.writeString(drop.resolve("b.jsonl"), jsonl(batchB))
    runStream(drop.toString, state, out, ckpt)
    val afterB = LineDedupStream.results(spark, out)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(afterB(12L)._4.startsWith(repeatNew), "cross-batch repeat must pass admission")

    // crash-replay: re-running an admitted batch is byte-idempotent
    // (read-only state, INSERT OVERWRITE output)
    val before = spark.read.parquet(s"$out/batch=1")
      .collect().map(_.toString).sorted.toSeq
    LineDedupStream.processBatch(
      batchB.toDF("doc_id", "text"), 1L, state, out, MC)
    val after = spark.read.parquet(s"$out/batch=1")
      .collect().map(_.toString).sorted.toSeq
    assert(before == after)

    // rebuild 1 over base + all arrivals == the batch operator over
    // everything: the cross-batch repeat is caught (doc 11 keeps the
    // first copy, doc 12 loses it), frozen cuts stay cut
    val raw = (base ++ batchA ++ batchB).toDF("doc_id", "text")
    LineDedupStream.rebuildCompact(spark, raw, state, clean, rebuildId = 1L, minChars = MC)
    val rebuilt = spark.read.parquet(s"$clean/rebuild=1")
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = TextOps.dedupLines(raw, "doc_id", "text", MC)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rebuilt == want)
    val m = rebuilt.toMap
    assert(m(11L).startsWith(repeatNew))
    assert(m(12L) == "trailing body of doc twelve long enough")

    // admission against the NEW generation: the once-passed repeat is
    // now frozen and gets cut
    val batchC = Seq((13L, s"$repeatNew\nbody of doc thirteen long enough line"))
    Files.writeString(drop.resolve("c.jsonl"), jsonl(batchC))
    runStream(drop.toString, state, out, ckpt)
    val afterC = LineDedupStream.results(spark, out)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(afterC(13L)._4 == "body of doc thirteen long enough line")
  }
}
