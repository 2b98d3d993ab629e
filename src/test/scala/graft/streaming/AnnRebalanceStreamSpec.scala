package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.{Ann, Pq}

/** Stream-maintained index ≡ batch-rebuilt across a restart that
  * includes one REBALANCE: phase-1 arrivals pack against the bootstrap
  * router, `rebalanceCompact` splits the over-full lists and refreshes
  * the router, the RESTARTED stream packs phase-2 arrivals against the
  * refreshed router, and the layered resolve (rebalanced base ∪ new
  * batches) is row-identical to composing the same steps in batch —
  * with serving parity through the refreshed router, which must cover
  * every list id the index now contains.
  */
class AnnRebalanceStreamSpec extends SparkSpec {
  import spark.implicits._

  private val (dim, m) = (64, 32)

  private def dropChunk(df: org.apache.spark.sql.DataFrame, dropDir: Path, name: String): Unit = {
    val staging = Files.createTempDirectory("annrbchunk")
    df.coalesce(1).write.mode("overwrite").parquet(staging.resolve("out").toString)
    val part = Files.list(staging.resolve("out")).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, dropDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  private def key(df: org.apache.spark.sql.DataFrame) = df
    .select($"vec_id", $"list", concat_ws(",", $"codevec").as("cv"))
    .as[(Long, Long, String)].collect().toSeq.sorted

  test("restart with a rebalance in the middle: layered index equals batch composition") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
    val vecs = emb.select($"vec_id", $"embedding")
    val (_, cents) = Pq.trainSampled(emb, "vec_id", "embedding", dim, m, 16, iters = 2, sampleN = 100)
    val frozenCents = cents.cache(); frozenCents.count()
    // a COARSE bootstrap router (2 lists) so phase-1 arrivals provably
    // over-fill at least one list
    val bootCents = Ann.centroids(
      emb.select(($"label" % 2).cast("long").as("list"), $"embedding"), "list", "embedding")
      .cache()
    bootCents.count()

    val dir = Files.createTempDirectory("annrebalance")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val indexDir = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString
    val compactDir = dir.resolve("base").toString

    def runStream(router: org.apache.spark.sql.DataFrame): Unit = {
      val q = AnnIndexStream.run(
        spark, drop.toString, indexDir, ckpt, frozenCents, router, "list", dim, m)
      try assert(q.awaitTermination(120000), "stream did not finish within 120 s")
      finally q.stop()
    }

    // phase 1: 300 vectors across two micro-batches, bootstrap router
    dropChunk(vecs.filter($"vec_id" < 150), drop, "c0.parquet")
    dropChunk(vecs.filter($"vec_id" >= 150 && $"vec_id" < 300), drop, "c1.parquet")
    runStream(bootCents)

    // maintenance: with 300 live vectors in 2 lists, some list holds
    // >= 150 — maxListSize 120 forces at least one split. The batch
    // reference below replays the 2-WAY servable path, so pin that this
    // corpus stays in rebalanceCompact's k <= 2 routing regime (a
    // regenerated testdata drifting past 240-in-a-list must fail here,
    // not as a silent composition mismatch).
    val liveMax = spark.read.parquet(indexDir).groupBy($"list").count()
      .agg(max($"count")).as[Long].head()
    assert(liveMax <= 240L, s"worst list $liveMax would route k-way; update the reference")
    val (hiBatch, router) = AnnIndexStream.rebalanceCompact(
      spark, indexDir, compactDir, vecs, bootCents, "list",
      maxListSize = 120L, newListOffset = 2L)
    val routerC = router.cache(); routerC.count()
    val baseLists = spark.read.parquet(compactDir).select($"list").distinct()
      .as[Long].collect().toSet
    assert(baseLists.exists(_ >= 2L), s"no split happened: lists $baseLists")

    // phase 2: stream restarts AGAINST THE REFRESHED ROUTER
    dropChunk(vecs.filter($"vec_id" >= 300), drop, "c2.parquet")
    runStream(routerC)

    // layered read: rebalanced base ∪ batches above the high-water mark
    val base = spark.read.parquet(compactDir)
      .select($"vec_id", $"list", $"codevec", $"op", $"batch")
    val late = spark.read.parquet(indexDir)
      .withColumn("batch", $"batch".cast("long"))
      .filter($"batch" > hiBatch)
      .withColumn("op", lit("u"))
      .select($"vec_id", $"list", $"codevec", $"op", $"batch")
    val streamed = AnnIndexStream.resolve(base.unionByName(late), "list")
    assert(streamed.count() == 500)

    // batch composition of the same steps: pack phase 1 with the
    // bootstrap router, rebalance its live assignment identically,
    // pack phase 2 with the refreshed router
    val p1 = AnnIndexStream.packBatch(
      vecs.filter($"vec_id" < 300), frozenCents, bootCents, "list", dim, m)
    val (reAsn, _) = graft.similarity.Rebalance.splitListsServable(
      p1.select($"vec_id", $"list"), vecs, "vec_id", "embedding", "list",
      maxListSize = 120L, newListOffset = 2L)
    val p1re = p1.drop("list").join(reAsn, "vec_id")
      .select($"vec_id", $"list", $"codevec")
    val p2 = AnnIndexStream.packBatch(
      vecs.filter($"vec_id" >= 300), frozenCents, routerC, "list", dim, m)
    val reference = p1re.unionByName(p2)
    assert(key(streamed) == key(reference))

    // the refreshed router covers every list the index contains —
    // without the split centroids the new ids would be unprobeable
    val routerLists = routerC.select($"list").as[Long].collect().toSet
    val indexLists = streamed.select($"list").distinct().as[Long].collect().toSet
    assert(indexLists.subsetOf(routerLists),
      s"router misses lists ${indexLists -- routerLists}")

    // serving parity through the refreshed router
    def top5(index: org.apache.spark.sql.DataFrame) = Pq
      .ivfAdcTopKPacked(index, frozenCents, routerC,
        emb.filter($"vec_id" < 10), "vec_id", "embedding", "list",
        dim, m, k = 5, nprobe = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val served = top5(streamed)
    assert(served == top5(reference))
    assert(served.nonEmpty)

    frozenCents.unpersist(); bootCents.unpersist(); routerC.unpersist()
  }

  test("uniform growth routes maintenance through the one-pass k-way split") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
      .filter($"vec_id" < 300)
    val vecs = emb.select($"vec_id", $"embedding")
    val (_, cents) = Pq.trainSampled(emb, "vec_id", "embedding", dim, m, 16, iters = 2, sampleN = 100)
    val bootCents = Ann.centroids(
      emb.select(($"label" % 2).cast("long").as("list"), $"embedding"), "list", "embedding")

    val dir = Files.createTempDirectory("annrebalk")
    val indexDir = dir.resolve("index").toString
    val compactDir = dir.resolve("base").toString
    // a plain run-flavoured index: one packed batch, no lifecycle column
    AnnIndexStream.packBatch(vecs, cents, bootCents, "list", dim, m)
      .write.mode("overwrite").parquet(s"$indexDir/batch=0")

    // 300 vectors in 2 lists, target 60 ⇒ worst list ~150, k = 3:
    // the k-way routing regime
    val liveMax = spark.read.parquet(indexDir).groupBy($"list").count()
      .agg(max($"count")).as[Long].head()
    assert((liveMax + 59L) / 60L > 2L, s"corpus no longer forces k-way (max $liveMax)")
    val (_, router) = AnnIndexStream.rebalanceCompact(
      spark, indexDir, compactDir, vecs, bootCents, "list",
      maxListSize = 60L, newListOffset = 2L)

    // the compacted assignment equals a direct splitListsK composition
    val p0 = AnnIndexStream.packBatch(vecs, cents, bootCents, "list", dim, m)
    val (kAsn, kCents) = graft.similarity.Rebalance.splitListsK(
      p0.select($"vec_id", $"list"), vecs, "vec_id", "embedding", "list",
      maxListSize = 60L, newListOffset = 2L)
    val reference = p0.drop("list").join(kAsn, "vec_id")
      .select($"vec_id", $"list", $"codevec")
    val base = spark.read.parquet(compactDir)
    assert(key(base) == key(reference))
    // a k >= 3 split actually happened (ids beyond the 2-way range)
    val lists = base.select($"list").distinct().as[Long].collect().toSet
    assert(lists.exists(_ >= 4L), s"no k-way split evident: lists $lists")
    // the refreshed router covers every produced list id
    val routerLists = router.select($"list").as[Long].collect().toSet
    assert(lists.subsetOf(routerLists), s"router misses ${lists -- routerLists}")
    // and carries the k-way pass's centroids for the touched set
    val kc = kCents.select($"list").as[Long].collect().toSet
    assert(kc.subsetOf(routerLists))
  }
}
