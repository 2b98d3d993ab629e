package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Ann

/** Streaming twin of the hierarchical rep-ladder tier (gates
  * e22/e22b): clone arrivals fold into the duplicate-class map with
  * zero graph work and serve EXACTLY through expansion; new-vector
  * arrivals are labelled, level-assigned by the frozen hash
  * thresholds (the same membership a rebuild's rank would give them),
  * ladder-inserted via the serving descent, and retrievable through
  * their reversed edges; replays are byte-idempotent; the rebuild IS
  * the batch ladder build over the accumulated corpus.
  */
class HnswIndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private val P = HnswIndexStream.LadderParams(
    layers = 2, fanout = 4L, kUpper = 3, nprobeUpper = 2,
    k0 = 3, nprobe0 = 2, beamUpper = 8, hopsUpper = 6,
    beamWidth = 8, hops = 8)

  // one smooth angular chain (node i at 3°·i — navigable by
  // construction at every layer), labels = three contiguous arcs, plus
  // EXACT clones of two nodes — the rep collapse must fold the clones
  // before any graph indexes them
  private def vecAt(deg: Double): Array[Float] = {
    val th = math.toRadians(deg)
    Array(math.cos(th).toFloat, math.sin(th).toFloat)
  }

  private def base = {
    val distinct = (0L until 48L).map(i => (i, i / 16L, vecAt(3.0 * i)))
    val clones = Seq(
      (200L, 0L, vecAt(3.0 * 5)),   // clone of vec 5
      (201L, 1L, vecAt(3.0 * 23)))  // clone of vec 23
    (distinct ++ clones).toDF("vec_id", "label", "embedding")
  }

  private def jsonl(rows: Seq[(Long, Array[Float])]): String =
    rows.toDF("vec_id", "embedding")
      .select(to_json(struct($"vec_id", $"embedding"))).as[String]
      .collect().mkString("", "\n", "\n")

  private def runStream(drop: String, state: String, ckpt: String): Unit = {
    val q = HnswIndexStream.run(spark, drop, state, ckpt, P)
    try assert(q.awaitTermination(180000), "stream did not finish within 180 s")
    finally q.stop()
  }

  /** First id in [from, from+5000) whose salted ladder hash is <= the
    * bound — lets the fixture deterministically manufacture an arrival
    * that lands in an upper layer.
    */
  private def idWithHashAtMost(bound: Long, from: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Iterator.range(from, from + 5000L).find { id =>
      val hex = md.digest(s"hnsw:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(7)
      java.lang.Long.parseLong(hex, 16) <= bound
    }.getOrElse(sys.error(s"no id in [$from, ${from + 5000}) under $bound"))
  }

  test("clone fold, level assignment, ladder insert, serving, replay, rebuild ≡ batch") {
    val dir = Files.createTempDirectory("hnswidx")
    val drop = dir.resolve("drop"); Files.createDirectories(drop)
    val state = dir.resolve("state").toString
    val ckpt = dir.resolve("ckpt").toString

    // ---- generation 0 ≡ the batch ladder build
    HnswIndexStream.buildGeneration(spark, base, state, 0L, P)
    assert(spark.read.parquet(s"$state/reps/rebuild=0").count() == 48L,
      "rep collapse must fold the two exact clones before indexing")
    val repOf200 = spark.read.parquet(s"$state/repmap/rebuild=0")
      .filter($"vec_id" === 200L).select($"rep").as[Long].head()
    assert(repOf200 == 5L, s"clone 200 must map to rep 5, got $repOf200")

    // thresholds follow the rank rule exactly
    val ranks = Ann.hnswRanks(
      spark.read.parquet(s"$state/reps/rebuild=0"), "vec_id")
    val thr = spark.read.parquet(s"$state/thresholds/rebuild=0")
      .collect().map(r => r.getAs[Int]("layer") -> r.getAs[Long]("hmax")).toMap
    val l1Size = Ann.layerSize(48L, 1, P.fanout)
    val l1Members = ranks.filter($"hrank" <= l1Size)
      .select($"vec_id").as[Long].collect().toSet
    val got1 = Ann.hnswRanks(
      spark.read.parquet(s"$state/reps/rebuild=0"), "vec_id")
      .filter(Ann.hnswHash($"vec_id") <= thr(1))
      .select($"vec_id").as[Long].collect().toSet
    assert(got1 == l1Members, "threshold rule diverged from the rank rule")

    // ---- arrivals: an exact clone of vec 9, a fresh base-layer
    // vector, and a fresh vector whose id HASHES INTO layer 1 (found
    // deterministically), so the upper-layer insert path runs
    val upperId = idWithHashAtMost(thr(1), 300L)
    val arrivalRows = Seq(
      (100L, vecAt(3.0 * 9)),      // exact clone of vec 9
      (101L, vecAt(91.0)),         // fresh, arc 1 (between nodes 30/31)
      (upperId, vecAt(121.0)))     // fresh, arc 2, level >= 1
    Files.writeString(drop.resolve("b1.jsonl"), jsonl(arrivalRows))
    runStream(drop.toString, state, ckpt)

    // clone folded with no graph work; fresh vectors labelled
    val arr = spark.read.parquet(s"$state/arrivals/rebuild=0")
    val arrMap = arr.select($"vec_id", $"rep").as[(Long, Long)].collect().toMap
    assert(arrMap(100L) == 9L, s"clone arrival must map to rep 9: $arrMap")
    assert(arrMap(101L) == 101L && arrMap(upperId) == upperId)
    val labels = arr.filter($"label" =!= -1L)
      .select($"vec_id", $"label").as[(Long, Long)].collect().toMap
    assert(labels == Map(101L -> 1L, upperId -> 2L), s"labels: $labels")

    // insert edges: layer 0 for both fresh vectors; layer 1 ONLY for
    // the high-hash arrival; the clone got none
    val ins0 = spark.read.parquet(s"$state/inserts/rebuild=0/layer=0")
      .select($"qid").distinct().as[Long].collect().toSet
    assert(ins0 == Set(101L, upperId), s"layer-0 inserts: $ins0")
    val ins1 = spark.read.parquet(s"$state/inserts/rebuild=0/layer=1")
      .select($"qid").distinct().as[Long].collect().toSet
    assert(ins1 == Set(upperId), s"layer-1 inserts: $ins1")
    // the inserted edges are the arrival's exact frozen-corpus
    // neighbours (the fixture is navigable)
    val exactN = Ann.bruteTopK(
        spark.read.parquet(s"$state/reps/rebuild=0")
          .select($"vec_id", $"embedding"),
        Seq((101L, vecAt(91.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", P.k0)
      .select($"bid").as[Long].collect().toSet
    val got101 = spark.read.parquet(s"$state/inserts/rebuild=0/layer=0")
      .filter($"qid" === 101L).select($"bid").as[Long].collect().toSet
    assert(got101 == exactN, s"insert edges $got101 != exact $exactN")

    // ---- serving: the clone arrival comes back EXACTLY for a query
    // at its position (expansion), and fresh arrivals are reachable
    // through reversed insert edges
    val probe = Seq(
      (900L, vecAt(27.2)),         // at clone 100's position (node 9)
      (901L, vecAt(91.05))).toDF("vec_id", "embedding")
    val served = HnswIndexStream.servingSearch(spark, state, probe, P, k = 3)
    val by = served.select($"qid", $"bid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(by(900L).contains(100L),
      s"clone arrival 100 not served through expansion: ${by(900L)}")
    assert(by(901L).contains(101L),
      s"fresh arrival 101 not reachable through its reversed edges: ${by(901L)}")

    // ---- replay idempotence
    val before = spark.read.parquet(s"$state/inserts/rebuild=0/layer=0")
      .orderBy($"qid", $"rank").collect().toSeq
    HnswIndexStream.processBatch(
      arrivalRows.toDF("vec_id", "embedding"), 0L, state, P)
    val after = spark.read.parquet(s"$state/inserts/rebuild=0/layer=0")
      .orderBy($"qid", $"rank").collect().toSeq
    assert(before == after, "replayed batch diverged")

    // ---- rebuild 1 over the accumulated corpus ≡ the batch build
    // over base ∪ arrivals (clone folded, arrivals adjacencied)
    val acc = HnswIndexStream.accumulatedCorpus(spark, state)
    assert(acc.count() == 53L, s"accumulated corpus: ${acc.count()}")
    assert(acc.select($"vec_id").distinct().count() == 53L)
    HnswIndexStream.rebuildCompact(spark, acc, state, 1L, P)
    assert(HnswIndexStream.latestRebuild(spark, state) == 1L)
    // clone arrival folded into its class at rebuild
    val rep100 = spark.read.parquet(s"$state/repmap/rebuild=1")
      .filter($"vec_id" === 100L).select($"rep").as[Long].head()
    assert(rep100 == 9L, s"rebuild must fold clone arrival 100 into rep 9: $rep100")
    // rebuilt edges0 ≡ the batch operator over the same corpus
    val rebuilt = spark.read.parquet(s"$state/edges0/rebuild=1")
      .orderBy($"qid", $"bid").collect().toSeq
    val accReps = acc.join(
      Ann.representatives(acc, "vec_id", "embedding")
        .where($"vec_id" === $"rep").select($"vec_id"), "vec_id")
    val want = Ann.symmetrize(Ann.knnGraph(
        accReps, "vec_id", "embedding", "label", P.k0, P.nprobe0))
      .orderBy($"qid", $"bid").collect().toSeq
    assert(rebuilt == want, "rebuild 1 diverged from the batch ladder build")

    // serving from the fresh generation still reaches everything
    val served2 = HnswIndexStream.servingSearch(spark, state, probe, P, k = 3)
    val by2 = served2.select($"qid", $"bid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(by2(900L).contains(100L) && by2(901L).contains(101L),
      s"post-rebuild serving lost an arrival: $by2")
  }
}
