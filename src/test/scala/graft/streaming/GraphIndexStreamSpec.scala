package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Ann

/** Streaming twin of the graph-ANN tier (gate e21): arrivals are
  * beam-inserted against the frozen graph generation (HNSW's insert =
  * the serving search), immediately retrievable through their reversed
  * edges, byte-idempotent under replay; the periodic rebuild IS the
  * batch graph over the accumulated corpus — the exactness contract
  * `GraphIndexStream`'s scaladoc states.
  */
class GraphIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private val P = GraphIndexStream.GraphParams(k = 3, nprobe = 2,
    beamWidth = 8, hops = 8)

  // three well-separated clusters, 20 DISTINCT vectors each (a smooth
  // chain within each cluster, so the graph is navigable — identical
  // vectors would fragment a degree-3 graph into twin cliques),
  // label = cluster
  private def base = (0L until 60L).map { i =>
    val p = 0.01f * (i % 20)
    val vec =
      if (i < 20L) Array(1.0f, p, 0.0f)
      else if (i < 40L) Array(-1.0f, 0.0f, p)
      else Array(0.0f, 1.0f, p)
    (i, i / 20L, vec)
  }.toDF("vec_id", "label", "embedding")

  // arrivals: two per cluster, close to existing members
  private val arrivalRows = Seq(
    (100L, Array(1.0f, 0.013f, 0.0f)),
    (101L, Array(-1.0f, 0.0f, 0.052f)),
    (102L, Array(0.0f, 1.0f, 0.031f)),
    (103L, Array(1.0f, 0.058f, 0.0f)))

  private def jsonl(rows: Seq[(Long, Array[Float])]): String =
    rows.toDF("vec_id", "embedding")
      .select(to_json(struct($"vec_id", $"embedding"))).as[String]
      .collect().mkString("", "\n", "\n")

  private def runStream(drop: String, state: String, ckpt: String): Unit = {
    val q = GraphIndexStream.run(spark, drop, state, ckpt, P)
    try assert(q.awaitTermination(180000), "stream did not finish within 180 s")
    finally q.stop()
  }

  test("rebuild is the batch operator; inserts are exact-neighbour edges; serving reaches arrivals; replay is idempotent") {
    val dir = Files.createTempDirectory("graphidx")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val state = dir.resolve("state").toString
    val ckpt = dir.resolve("ckpt").toString

    // ---- rebuild 0 ≡ the batch graph over the base corpus
    GraphIndexStream.rebuildCompact(spark, base, state, 0L, P)
    val frozenEdges = spark.read.parquet(s"$state/edges/rebuild=0")
    val batchGraph = Ann.knnGraph(base, "vec_id", "embedding", "label", P.k, P.nprobe)
    assert(
      frozenEdges.orderBy($"qid", $"rank").collect().toSeq ==
        batchGraph.orderBy($"qid", $"rank").collect().toSeq,
      "rebuild 0 diverged from the batch graph build")

    // ---- stream two arrival batches
    Files.writeString(drop.resolve("b1.jsonl"), jsonl(arrivalRows.take(2)))
    runStream(drop.toString, state, ckpt)
    Files.writeString(drop.resolve("b2.jsonl"), jsonl(arrivalRows.drop(2)))
    runStream(drop.toString, state, ckpt)

    // ---- insert edges = the arrival's EXACT top-k over the frozen
    // corpus (the fixture is navigable, so the beam insert is exact)
    val inserts = spark.read.parquet(s"$state/inserts")
      .select($"qid", $"rank", $"bid").as[(Long, Long, Long)]
      .collect().toSet
    val exact = Ann.bruteTopK(
        base.select($"vec_id", $"embedding"),
        arrivalRows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", P.k)
      .select($"qid", $"rank", $"bid").as[(Long, Long, Long)]
      .collect().toSet
    assert(inserts == exact, "beam-inserted edges missed exact neighbours")

    // ---- arrivals were labelled with their cluster at admission
    val labels = spark.read.parquet(s"$state/arrivals")
      .select($"vec_id", $"label").as[(Long, Long)].collect().toMap
    assert(labels == Map(100L -> 0L, 101L -> 1L, 102L -> 2L, 103L -> 0L))

    // ---- serving reaches an inserted node through its reversed edges
    val probe = Seq((900L, Array(1.0f, 0.0131f, 0.0f))).toDF("vec_id", "embedding")
    val served = GraphIndexStream.servingSearch(spark, state, probe, P, k = 3)
      .select($"bid").as[Long].collect().toSet
    assert(served.contains(100L),
      s"arrival 100 not retrievable through the live index (got $served)")

    // ---- replay idempotence: re-processing batch 0's rows under the
    // same batch id rewrites byte-identical inserts
    val before = spark.read.parquet(s"$state/inserts/rebuild=0/batch=0")
      .orderBy($"qid", $"rank").collect().toSeq
    GraphIndexStream.processBatch(
      arrivalRows.take(2).toDF("vec_id", "embedding"), 0L, state, P)
    val after = spark.read.parquet(s"$state/inserts/rebuild=0/batch=0")
      .orderBy($"qid", $"rank").collect().toSeq
    assert(before == after, "replayed batch diverged")

    // ---- rebuild 1 over the accumulated corpus ≡ the batch operator
    // over base ∪ arrivals (arrival-vs-arrival adjacency restored)
    val gen0Arrivals = spark.read.parquet(s"$state/arrivals/rebuild=0")
      .select($"vec_id", $"label", $"embedding")
    val acc = GraphIndexStream.accumulatedCorpus(spark, state)
    GraphIndexStream.rebuildCompact(spark, acc, state, 1L, P)
    val rebuilt = spark.read.parquet(s"$state/edges/rebuild=1")
      .orderBy($"qid", $"rank").collect().toSeq
    val want = Ann.knnGraph(
        base.unionByName(gen0Arrivals),
        "vec_id", "embedding", "label", P.k, P.nprobe)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(rebuilt == want, "rebuild 1 diverged from the batch graph over the accumulated corpus")
    assert(GraphIndexStream.latestRebuild(spark, state) == 1L)

    // ---- ARRIVALS AFTER REBUILD 1: the generation-scoping contract.
    // Rebuild 1's snapshot ABSORBED the four gen-0 arrivals; new
    // arrivals admit against generation 1, and no reader may union the
    // absorbed gen-0 batches back in (that double-counted: the same
    // bid earned two row_number ranks in the beam and the next rebuild
    // built its graph over a duplicated corpus).
    val arrivalRows2 = Seq(
      (104L, Array(-1.0f, 0.0f, 0.087f)),
      (105L, Array(0.0f, 1.0f, 0.094f)))
    Files.writeString(drop.resolve("b3.jsonl"), jsonl(arrivalRows2))
    runStream(drop.toString, state, ckpt)

    // accumulated corpus = snapshot 1 (base ∪ gen-0 arrivals) ∪ gen-1
    // arrivals, every vec_id EXACTLY once
    val acc1 = GraphIndexStream.accumulatedCorpus(spark, state)
    assert(acc1.count() == 66L,
      s"accumulated corpus after rebuild 1 must hold 66 rows, got ${acc1.count()}")
    assert(acc1.select($"vec_id").distinct().count() == 66L,
      "accumulated corpus holds duplicate vec_ids — a reader unioned absorbed arrivals")

    // serving over the live gen-1 index: reaches the new arrival, and
    // no qid ever sees the same bid twice (the duplicate-rank symptom)
    val probe2 = Seq((901L, Array(-1.0f, 0.0f, 0.0871f))).toDF("vec_id", "embedding")
    val served2 = GraphIndexStream.servingSearch(spark, state, probe2, P, k = 3)
    val bids2 = served2.select($"bid").as[Long].collect().toSeq
    assert(bids2.contains(104L),
      s"gen-1 arrival 104 not retrievable through the live index (got $bids2)")
    assert(bids2.distinct.size == bids2.size,
      s"serving returned a duplicate bid — corpus rows double-counted ($bids2)")

    // ---- rebuild 2 ≡ the batch operator over base ∪ ALL six arrivals
    GraphIndexStream.rebuildCompact(spark, acc1, state, 2L, P)
    val rebuilt2 = spark.read.parquet(s"$state/edges/rebuild=2")
      .orderBy($"qid", $"rank").collect().toSeq
    val allArrivals = (arrivalRows ++ arrivalRows2).toDF("vec_id", "embedding")
    val labelled = Ann.assign(allArrivals,
        Ann.centroids(base, "label", "embedding"), "vec_id", "embedding", "label")
      .select($"vec_id", $"label")
      .join(allArrivals, Seq("vec_id"))
      .select($"vec_id", $"label", $"embedding")
    val want2 = Ann.knnGraph(
        base.unionByName(labelled),
        "vec_id", "embedding", "label", P.k, P.nprobe)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(rebuilt2 == want2,
      "rebuild 2 diverged from the batch graph over base ∪ all arrivals")
    assert(GraphIndexStream.latestRebuild(spark, state) == 2L)
  }
}
