package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming twin of the r8 weighted sample: the A-ES top-n reduction
  * is associative, so the reservoir after ANY prefix of arrivals is
  * bit-identical to the batch operator over everything seen — across
  * micro-batch boundaries, a stream stop/restart, a replayed batch,
  * and ANY re-batching of the same arrivals.
  */
class SampleStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val N = 40
  private val Salt = "ws1"

  private def runStream(drop: String, state: String, ckpt: String): Unit = {
    val q = SampleStream.run(spark, drop, state, ckpt, Salt, N)
    try assert(q.awaitTermination(180000), "stream did not finish within 180 s")
    finally q.stop()
  }

  private def jsonl(slice: Seq[(Long, String)]): String =
    slice.toDF("doc_id", "text")
      .select(to_json(struct($"doc_id", $"text"))).as[String]
      .collect().mkString("", "\n", "\n")

  private def batchWant(docs: Seq[(Long, String)]): Set[(Long, Long)] =
    graft.operators.Sampling.weightedSample(
        docs.toDF("doc_id", "text")
          .select($"doc_id", graft.functions.Exprs.tokenCount($"text").cast("long").as("n_tokens")),
        "doc_id", "n_tokens", Salt, N)
      .as[(Long, Long)].collect().toSet

  test("reservoir equals the batch sample across restart, replay and re-batching") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq

    val dir = Files.createTempDirectory("samplestream")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val ckpt = dir.resolve("ckpt").toString
    val state = s"sstate_${dir.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"

    val cuts = Seq(0, docs.length / 3, 2 * docs.length / 3, docs.length)
    // drop 1, stream, STOP; drops 2+3 land while the stream is down
    Files.writeString(drop.resolve("d1.jsonl"), jsonl(docs.slice(cuts(0), cuts(1))))
    runStream(drop.toString, state, ckpt)
    // mid-stream the reservoir is the batch sample over the prefix
    val mid = SampleStream.reservoir(spark, state)
      .as[(Long, Long)].collect().toSet
    assert(mid == batchWant(docs.slice(cuts(0), cuts(1))),
      "prefix reservoir diverged from the batch sample over the prefix")

    Files.writeString(drop.resolve("d2.jsonl"), jsonl(docs.slice(cuts(1), cuts(2))))
    Files.writeString(drop.resolve("d3.jsonl"), jsonl(docs.slice(cuts(2), cuts(3))))
    runStream(drop.toString, state, ckpt)

    val want = batchWant(docs)
    val got = SampleStream.reservoir(spark, state)
      .as[(Long, Long)].collect().toSet
    assert(got == want, "final reservoir diverged from the batch sample")

    // replayed batch: re-processing the LAST batch's rows under its id
    // rewrites the identical generation
    val lastBatchId = spark.table(state)
      .agg(max($"batch")).as[Long].head()
    SampleStream.processBatch(
      docs.slice(cuts(2), cuts(3)).toDF("doc_id", "text"),
      lastBatchId, state, Salt, N)
    val replayed = SampleStream.reservoir(spark, state)
      .as[(Long, Long)].collect().toSet
    assert(replayed == want, "replayed batch diverged")

    // re-batching invariance (associativity): the same arrivals in 2
    // very different splits produce the identical reservoir
    val dir2 = Files.createTempDirectory("samplestream2")
    val drop2 = dir2.resolve("drop"); Files.createDirectories(drop2)
    val ckpt2 = dir2.resolve("ckpt").toString
    val state2 = s"sstate_${dir2.getFileName.toString.replaceAll("[^a-zA-Z0-9]", "")}"
    Files.writeString(drop2.resolve("a.jsonl"), jsonl(docs.take(5)))
    Files.writeString(drop2.resolve("b.jsonl"), jsonl(docs.slice(5, docs.length)))
    runStream(drop2.toString, state2, ckpt2)
    val got2 = SampleStream.reservoir(spark, state2)
      .as[(Long, Long)].collect().toSet
    assert(got2 == want, "re-batched reservoir diverged — top-n not associative?")

    // LOST-CATALOG RECOVERY: a restarted application whose in-memory
    // metastore forgot the table must RE-ADOPT the reservoir
    // generations still on disk (StateTables MSCK discipline), never
    // wipe them — wiping would silently reset the sample while the
    // stream checkpoint still skips the batches that built it.
    val gensBefore = spark.table(state2).select($"batch").distinct().count()
    spark.sql(s"DROP TABLE $state2") // external: files survive the drop
    SampleStream.processBatch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      gensBefore + 10L, state2, Salt, N)
    val adopted = SampleStream.reservoir(spark, state2)
      .as[(Long, Long)].collect().toSet
    // the new batch saw the full prior reservoir as its base, so its
    // claimed generation is exactly `want` again — NOT an empty sample
    // over a wiped table
    assert(adopted == want,
      "reservoir after a catalog loss diverged — prior state wiped instead of re-adopted")
  }
}
