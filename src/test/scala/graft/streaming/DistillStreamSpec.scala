package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.QualityModel

/** Streaming lifecycle of the distilled quality model (t40's twin):
  * frozen-generation scoring at ingestion ≡ the batch
  * classifyWithModel, lossless weight round trip through the state
  * table, idempotent replay under a fixed generation, and a retrain
  * over the accumulated arrivals that IS the batch trainer — and
  * actually moves decisions.
  */
class DistillStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val B = 256
  private val E = 8

  private def runStream(drop: String, wtable: String, arr: String,
                        out: String, ckpt: String): Unit = {
    val q = DistillStream.run(spark, drop, wtable, arr, out, ckpt, B)
    try assert(q.awaitTermination(180000), "stream did not finish within 180 s")
    finally q.stop()
  }

  private def jsonl(slice: Seq[(Long, String)]): String =
    slice.toDF("doc_id", "text")
      .select(to_json(struct($"doc_id", $"text"))).as[String]
      .collect().mkString("", "\n", "\n")

  test("frozen scoring equals batch serve; retrain is the batch trainer over accumulated arrivals") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq
    val (boot, rest) = docs.splitAt(docs.length / 2)

    val dir = Files.createTempDirectory("distillstream")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val arr = dir.resolve("arrivals").toString
    val out = dir.resolve("out").toString
    val ckpt = dir.resolve("ckpt").toString
    val wtable = s"dstate_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    // generation 0: train on the bootstrap half; round trip lossless
    val bootLab = boot.toDF("doc_id", "text")
      .select($"doc_id", $"text", DistillStream.label("text").as("y"))
    val w0 = DistillStream.retrainCompact(spark, bootLab, wtable, 0L, B, E)
    assert(DistillStream.loadWeights(spark, wtable, B).toSeq == w0.toSeq,
      "weight round trip through the state table lost information")

    // stream the other half in two drops with a stop between
    val cut = rest.length / 2
    Files.writeString(drop.resolve("d1.jsonl"), jsonl(rest.take(cut)))
    runStream(drop.toString, wtable, arr, out, ckpt)
    Files.writeString(drop.resolve("d2.jsonl"), jsonl(rest.drop(cut)))
    runStream(drop.toString, wtable, arr, out, ckpt)

    // admission ≡ the batch serve under the frozen generation
    val got = DistillStream.results(spark, out)
      .select($"doc_id", $"n_tokens", $"score", $"kept")
      .orderBy($"doc_id").collect().toSeq
    val want = QualityModel
      .classifyWithModel(rest.toDF("doc_id", "text"), "doc_id", "text", B,
        QualityModel.weightsTable(spark, w0))
      .orderBy($"doc_id").collect().toSeq
    assert(got == want, "stream scoring diverged from the batch serve")

    // replay idempotence under the fixed generation
    val before = spark.read.parquet(s"$out/batch=0").orderBy($"doc_id").collect().toSeq
    DistillStream.processBatch(rest.take(cut).toDF("doc_id", "text"),
      0L, wtable, arr, out, B)
    val after = spark.read.parquet(s"$out/batch=0").orderBy($"doc_id").collect().toSeq
    assert(before == after, "replayed batch diverged under a fixed generation")

    // retrain over bootstrap ∪ accumulated arrivals ≡ the batch
    // trainer over the full corpus
    val acc = bootLab.unionByName(DistillStream.arrivals(spark, arr))
    val w1 = DistillStream.retrainCompact(spark, acc, wtable, 1L, B, E)
    val wantW = QualityModel.train(
      docs.toDF("doc_id", "text")
        .select($"doc_id", $"text", DistillStream.label("text").as("y")),
      "doc_id", "text", "y", B, E)
    assert(w1.toSeq == wantW.toSeq, "retrain diverged from the batch trainer")
    assert(DistillStream.loadWeights(spark, wtable, B).toSeq == w1.toSeq,
      "loadWeights did not pick up the new generation")

    // the new generation is a different model (non-vacuous retrain)
    assert(w1.toSeq != w0.toSeq, "retrain produced the identical model — spec vacuous")

    // LOST-CATALOG RECOVERY: a restarted JVM whose in-memory metastore
    // forgot the weights table must re-adopt the frozen generations
    // still on disk (StateTables MSCK discipline) — loadWeights after
    // the catalog loss must serve generation 1, not fail or serve a
    // wiped table.
    spark.sql(s"DROP TABLE $wtable") // external: files survive the drop
    val w2 = DistillStream.retrainCompact(spark, acc, wtable, 2L, B, E)
    assert(DistillStream.loadWeights(spark, wtable, B).toSeq == w2.toSeq)
    val gens = spark.table(wtable).select($"batch").distinct()
      .as[Long].collect().toSet
    assert(gens == Set(0L, 1L, 2L),
      s"prior weight generations wiped on catalog loss (got $gens)")
  }
}
