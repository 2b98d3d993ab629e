package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming twin of the t34 DSIR gate: documents arriving in
  * micro-batches are scored under BOTH frozen LMs (one fused scan),
  * gated on the importance log-ratio, and admitted against a running
  * token budget — and the accumulated output is row-identical to the
  * shared batch definition over the same arrival prefix, across a
  * restart and a crash-replayed batch. The third test ties the twin
  * to t34 itself: arrivals in the offline ranking's own order with
  * the boundary ratio as threshold reproduce t34's kept set exactly.
  */
class DsirStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  // sf0.001 logratio quartiles ~(-110M, -76M, -41M): -70M keeps ~45%
  // of docs in the ratio gate; budget 5000 of their ~8k tokens closes
  // the budget partway — all three decision classes live.
  private val MinRatio = -70000000L
  private val Budget = 5000L

  private def docsAll = graft.Tables.documents(spark, sfDir)
    .select($"doc_id", $"source", $"text")

  private def freshNames(tag: String): (String, String) = {
    val dir = Files.createTempDirectory(tag)
    val k = dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")
    (s"dsirlm_$k", s"dsirst_$k")
  }

  private def runStream(drop: String, lmTable: String, state: String,
                        out: String, ckpt: String, minRatio: Long,
                        budget: Long): Unit = {
    val q = DsirStream.run(spark, drop, lmTable, state, out, ckpt, minRatio, budget)
    try assert(q.awaitTermination(180000), "stream did not finish within 180 s")
    finally q.stop()
  }

  test("stream over doc_id-ordered drops equals batch selection across a restart") {
    val dir = Files.createTempDirectory("dsirstream")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val (lmTable, state) = freshNames("dsirtabs")

    val docs = docsAll.orderBy($"doc_id").as[(Long, String, String)].collect()
    DsirStream.freezeLms(spark, docsAll, "doc_id", "text", "source", "src0", lmTable)

    val cuts = Seq(0, docs.length / 3, 2 * docs.length / 3, docs.length)
    def jsonl(slice: Array[(Long, String, String)]): String =
      slice.toSeq.toDF("doc_id", "source", "text")
        .select(to_json(struct($"doc_id", $"source", $"text"))).as[String]
        .collect().mkString("", "\n", "\n")

    // drop 1, stop; drops 2+3 land while the stream is down — the
    // restart scores them against the re-loaded frozen LM pair and
    // resumes the budget from the state table
    Files.writeString(drop.resolve("d1.jsonl"), jsonl(docs.slice(cuts(0), cuts(1))))
    runStream(drop.toString, lmTable, state, out, ckpt, MinRatio, Budget)
    Files.writeString(drop.resolve("d2.jsonl"), jsonl(docs.slice(cuts(1), cuts(2))))
    Files.writeString(drop.resolve("d3.jsonl"), jsonl(docs.slice(cuts(2), cuts(3))))
    runStream(drop.toString, lmTable, state, out, ckpt, MinRatio, Budget)

    val got = DsirStream.results(spark, out).orderBy($"doc_id")
      .as[(Long, String, Long, Long, Long, Long, String, Option[Long])]
      .collect().toSeq
    val (lmT, lmR) = DsirStream.loadLms(spark, lmTable)
    val want = DsirStream.batchSelection(docsAll, lmT, lmR, MinRatio, Budget)
      .orderBy($"doc_id")
      .as[(Long, String, Long, Long, Long, Long, String, Option[Long])]
      .collect().toSeq
    assert(got == want, "stream output diverged from batch selection")
    assert(want.map(_._7).toSet ==
      Set("admitted", "reject_ratio", "reject_budget"),
      s"decision classes not all live: ${want.map(_._7).toSet}")
  }

  test("replaying a micro-batch is idempotent after its state was written") {
    val dir = Files.createTempDirectory("dsirreplay")
    val out = dir.resolve("out").toString
    val (lmTable, state) = freshNames("dsirreplaytabs")
    DsirStream.freezeLms(spark, docsAll, "doc_id", "text", "source", "src0", lmTable)

    val b0 = docsAll.where($"doc_id" < 100)
    val b1 = docsAll.where($"doc_id" >= 100 && $"doc_id" < 250)
    DsirStream.processBatch(b0, 0L, lmTable, state, out, MinRatio, Budget)
    DsirStream.processBatch(b1, 1L, lmTable, state, out, MinRatio, Budget)
    def snap() = spark.read.parquet(out)
      .select($"doc_id", $"decision", $"cum_toks").orderBy($"doc_id")
      .as[(Long, String, Option[Long])].collect().toSeq
    val before = snap()
    DsirStream.processBatch(b1, 1L, lmTable, state, out, MinRatio, Budget)
    assert(snap() == before, "replay changed the output")
    // state stays tiny: one row per batch
    assert(spark.table(state).count() == 2)
  }

  test("arrivals in the offline ranking's order + its boundary ratio reproduce t34's kept set") {
    val dir = Files.createTempDirectory("dsirt34")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val (lmTable, state) = freshNames("dsirt34tabs")

    val t34 = graft.text.NgramLm
      .importanceSelection(docsAll, "doc_id", "text", "source", "src0", budgetToks = 8000L)
      .select($"doc_id", $"logratio_micro", $"kept")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keptIds = t34.filter(_._3 == 1L).map(_._1).toSet
    val boundary = t34.filter(_._3 == 1L).map(_._2).min

    // re-id the corpus so arrival (doc_id) order IS the offline
    // (logratio DESC, doc_id) ranking order; keep the mapping back
    val ranked = t34.sortBy { case (id, lr, _) => (-lr, id) }
    val newToOrig = ranked.zipWithIndex.map { case ((orig, _, _), i) =>
      (i + 1).toLong -> orig
    }.toMap
    val origToNew = newToOrig.map(_.swap)
    val reId = docsAll.as[(Long, String, String)].collect()
      .map { case (id, src, text) => (origToNew(id), src, text) }
      .sortBy(_._1)

    DsirStream.freezeLms(spark, docsAll, "doc_id", "text", "source", "src0", lmTable)
    val cuts = Seq(0, reId.length / 2, reId.length)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      Files.writeString(drop.resolve(s"d$i.jsonl"),
        reId.slice(a, b).toSeq.toDF("doc_id", "source", "text")
          .select(to_json(struct($"doc_id", $"source", $"text"))).as[String]
          .collect().mkString("", "\n", "\n"))
    }
    runStream(drop.toString, lmTable, state, out, ckpt, boundary, 8000L)

    val admitted = DsirStream.results(spark, out)
      .where($"decision" === "admitted").select($"doc_id")
      .as[Long].collect().map(newToOrig).toSet
    assert(admitted == keptIds,
      s"stream admitted ${admitted.size} docs, t34 kept ${keptIds.size}; " +
        s"diff ${(admitted -- keptIds) ++ (keptIds -- admitted)}")
  }
}
