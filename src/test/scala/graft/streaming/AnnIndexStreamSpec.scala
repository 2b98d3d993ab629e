package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.{Ann, Pq}

/** Streaming ANN index maintenance ≡ batch rebuild: embeddings arriving
  * across micro-batches (and across a stream stop/restart) are encoded
  * against the frozen codebook and the accumulated packed index is
  * row-identical to a one-shot batch build — and serving
  * ([[graft.similarity.Pq.ivfAdcTopKPacked]]) over the streamed index
  * returns exactly the batch search results.
  */
class AnnIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private val (dim, m) = (64, 32)

  /** Drop one chunk into the stream's input dir as a single flat
    * parquet file (the file source does not recurse into directories).
    */
  private def dropChunk(df: org.apache.spark.sql.DataFrame, dropDir: Path, name: String): Unit = {
    val staging = Files.createTempDirectory("annchunk")
    df.coalesce(1).write.mode("overwrite").parquet(staging.resolve("out").toString)
    val part = Files.list(staging.resolve("out")).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, dropDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  test("streamed packed index equals batch build; packed search is identical") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
    // Frozen artifacts: sampled codebook + label-centroid coarse lists
    // from the bootstrap corpus.
    val (_, cents) = Pq.trainSampled(emb, "vec_id", "embedding", dim, m, 16, iters = 2, sampleN = 100)
    val frozenCents = cents.cache(); frozenCents.count()
    val listCents = Ann.centroids(emb, "label", "embedding").cache(); listCents.count()

    val dir = Files.createTempDirectory("annstream")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val indexDir = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString

    def runStream(): Unit = {
      val q = AnnIndexStream.run(
        spark, drop.toString, indexDir, ckpt, frozenCents, listCents, "label", dim, m)
      try assert(q.awaitTermination(120000), "stream did not finish within 120 s")
      finally q.stop()
    }

    val vecs = emb.select($"vec_id", $"embedding")
    dropChunk(vecs.filter($"vec_id" < 150), drop, "c0.parquet")
    dropChunk(vecs.filter($"vec_id" >= 150 && $"vec_id" < 300), drop, "c1.parquet")
    runStream()
    // Stream is DOWN; a late chunk arrives; the restart must process
    // only the new file (checkpointed source offsets).
    dropChunk(vecs.filter($"vec_id" >= 300), drop, "c2.parquet")
    runStream()

    val streamed = spark.read.parquet(indexDir)
      .select($"vec_id", $"label", $"codevec")
    val batchIdx = AnnIndexStream.packBatch(vecs, frozenCents, listCents, "label", dim, m)

    // Row-identical index (frozen codebook ⇒ deterministic encode).
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select($"vec_id", $"label", concat_ws(",", $"codevec").as("cv"))
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(key(streamed) == key(batchIdx))
    assert(streamed.count() === 500)

    // Serving parity: same queries, same frozen artifacts, streamed
    // index vs batch index — identical top-5 (ranks, ids, distances).
    def top5(index: org.apache.spark.sql.DataFrame) = Pq
      .ivfAdcTopKPacked(index, frozenCents, listCents,
        emb.filter($"vec_id" < 10), "vec_id", "embedding", "label",
        dim, m, k = 5, nprobe = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(top5(streamed) == top5(batchIdx))
    assert(top5(streamed).nonEmpty)

    frozenCents.unpersist(); listCents.unpersist()
  }
}
