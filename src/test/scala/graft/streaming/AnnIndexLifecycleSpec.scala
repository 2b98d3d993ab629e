package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.{Ann, Pq}

/** Index lifecycle contracts on top of [[AnnIndexStreamSpec]]'s
  * append-only parity: DELETES (tombstones shadow older generations,
  * re-upserts resurrect), stream ≡ batch for the same event
  * generations across a stop/restart, served top-k never returns a
  * deleted vector, and LIST-LOCAL COMPACTION preserves the resolved
  * index while later batches stack correctly on the compacted base.
  */
class AnnIndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val (dim, m) = (64, 32)

  private def dropChunk(df: org.apache.spark.sql.DataFrame, dropDir: Path, name: String): Unit = {
    val staging = Files.createTempDirectory("annlcchunk")
    df.coalesce(1).write.mode("overwrite").parquet(staging.resolve("out").toString)
    val part = Files.list(staging.resolve("out")).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, dropDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  test("deletes tombstone, re-upserts resurrect; stream equals batch; compaction preserves") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
    val (_, cents) = Pq.trainSampled(emb, "vec_id", "embedding", dim, m, 16, iters = 2, sampleN = 100)
    val frozenCents = cents.cache(); frozenCents.count()
    val listCents = Ann.centroids(emb, "label", "embedding").cache(); listCents.count()

    val dir = Files.createTempDirectory("annlifecycle")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val indexDir = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString

    def runStream(): Unit = {
      val q = AnnIndexStream.runLifecycle(
        spark, drop.toString, indexDir, ckpt, frozenCents, listCents, "label", dim, m)
      try assert(q.awaitTermination(120000), "stream did not finish within 120 s")
      finally q.stop()
    }

    val vecs = emb.select($"vec_id", $"embedding")
    def ev(df: org.apache.spark.sql.DataFrame, op: String) =
      df.select($"vec_id", $"embedding", lit(op).as("op"))

    // gen 0: upsert everything; gen 1: delete vec_id % 7 == 3.
    dropChunk(ev(vecs, "u"), drop, "g0.parquet")
    dropChunk(ev(vecs.filter($"vec_id" % 7 === 3), "d"), drop, "g1.parquet")
    runStream()
    // Stream DOWN; gen 2 re-upserts half the deleted set; restart must
    // process only the new file (checkpointed offsets).
    dropChunk(ev(vecs.filter($"vec_id" % 14 === 3), "u"), drop, "g2.parquet")
    runStream()

    val streamed = AnnIndexStream.resolve(spark.read.parquet(indexDir), "label")

    // Live set: never-deleted plus re-upserted; dead set: % 7 without % 14.
    val liveIds = streamed.select($"vec_id").as[Long].collect().toSet
    val allIds = vecs.select($"vec_id").as[Long].collect().toSet
    val expectedLive = allIds.filter(id => id % 7 != 3 || id % 14 == 3)
    assert(liveIds == expectedLive)
    assert(expectedLive.size < allIds.size, "delete leg selected nothing")
    assert(allIds.exists(id => id % 14 == 3), "re-upsert leg selected nothing")

    // Stream ≡ batch: the same generations through packEventBatch.
    def gen(events: org.apache.spark.sql.DataFrame, batch: Long) =
      AnnIndexStream.packEventBatch(events, frozenCents, listCents, "label", dim, m)
        .withColumn("batch", lit(batch))
    val batchResolved = AnnIndexStream.resolve(
      gen(ev(vecs, "u"), 0L)
        .unionByName(gen(ev(vecs.filter($"vec_id" % 7 === 3), "d"), 1L))
        .unionByName(gen(ev(vecs.filter($"vec_id" % 14 === 3), "u"), 2L)),
      "label")
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select($"vec_id", $"label".cast("long"), concat_ws(",", $"codevec").as("cv"))
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(key(streamed) == key(batchResolved))

    // Serving: top-k over the resolved index never returns a dead vector.
    val dead = allIds -- expectedLive
    val served = Pq.ivfAdcTopKPacked(streamed, frozenCents, listCents,
      emb.filter($"vec_id" < 10), "vec_id", "embedding", "label",
      dim, m, k = 5, nprobe = 4)
    val servedIds = served.select($"bid").as[Long].collect().toSet
    assert(servedIds.nonEmpty)
    assert((servedIds & dead).isEmpty, s"served deleted vectors: ${(servedIds & dead).take(5)}")

    // Compaction: list-local rewrite preserves the resolved index...
    val compactDir = dir.resolve("compacted").toString
    val hiBatch = AnnIndexStream.compact(spark, indexDir, compactDir, "label")
    assert(hiBatch == 2L)
    val base = spark.read.parquet(compactDir)
    assert(key(AnnIndexStream.resolve(base, "label")) == key(streamed))
    // ...lays each list in its own partition directory (the pruning
    // layout a probe-restricted serve reads)...
    val listDirs = new java.io.File(compactDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("label=")).toSeq
    val nLists = emb.select($"label").distinct().count()
    assert(listDirs.size.toLong == nLists, s"got ${listDirs.size} list dirs, want $nLists")
    // ...holds exactly the live rows (tombstones resolved away, one
    // generation per vector)...
    assert(base.count() == expectedLive.size.toLong)
    // ...and later batches stack on top: delete one live vector above
    // the high-water mark and the layered resolve drops exactly it.
    val victim = expectedLive.head
    val late = gen(ev(vecs.filter($"vec_id" === victim), "d"), hiBatch + 1)
    val layered = AnnIndexStream.resolve(
      base.select($"vec_id", $"label", $"codevec", $"op", $"batch")
        .unionByName(late.select($"vec_id", $"label", $"codevec", $"op", $"batch")),
      "label")
    assert(layered.count() == expectedLive.size.toLong - 1)
    assert(layered.filter($"vec_id" === victim).count() == 0)

    frozenCents.unpersist(); listCents.unpersist()
  }
}
