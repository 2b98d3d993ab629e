package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Ann.hnswRanks]] / [[Ann.layerSize]] / [[Ann.hnswSearch]] — the
  * hierarchical (HNSW-family) ANN tier behind gate `e22_hnsw_search`:
  * the nested layer ladder's contract (determinism, partitioning
  * invariance, occupancy floor, the analytic md5 replay), per-query
  * entry seeding ≡ the global-entry mode on identical starts, layer
  * descent reaching a far neighbourhood on the chain fixture, and the
  * sf0.1 end-to-end recall floor the gate's `hit` column prices in.
  */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private def chain(n: Int) = {
    (0 until n).map { i =>
      val th = math.toRadians(10.0 * i)
      (i.toLong, Array(math.cos(th).toFloat, math.sin(th).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def chainEdges(n: Int) =
    (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("qid", "bid")

  test("hnswRanks replays the salted-md5 order and is partitioning-invariant") {
    val corpus = chain(40)
    val got = Ann.hnswRanks(corpus, "vec_id")
      .orderBy($"hrank").as[(Long, Long)].collect().toSeq
    // analytic replay: first 7 hex chars of md5("hnsw:<id>") as a long,
    // rank by (hash, id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): Long = {
      val hex = md.digest(s"hnsw:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(7)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = (0L until 40L).sortBy(id => (h(id), id)).zipWithIndex
      .map { case (id, i) => (id, i + 1L) }
    assert(got == want)
    val re = Ann.hnswRanks(corpus.repartition(7), "vec_id")
      .orderBy($"hrank").as[(Long, Long)].collect().toSeq
    assert(re == want, "rank changed under repartitioning")
  }

  test("layerSize: geometric decay with a 2-member occupancy floor") {
    assert(Ann.layerSize(2000, 1) == 250L)
    assert(Ann.layerSize(2000, 2) == 32L)
    assert(Ann.layerSize(2000, 3) == 4L)
    assert(Ann.layerSize(20, 2) == 2L, "floor must keep tiny layers servable")
    assert(Ann.layerSize(20, 3) == 2L)
    // nesting: layer sizes are monotone, so rank-prefix membership nests
    (1 to 5).sliding(2).foreach { w =>
      assert(Ann.layerSize(100000, w(0)) >= Ann.layerSize(100000, w(1)))
    }
  }

  test("entryPairs seeding equals the global-entry mode on identical starts") {
    val n = 24
    val corpus = chain(n)
    val queries = corpus.where($"vec_id" < 3L)
    val g = chainEdges(n)
    val entries = Seq(23L, 11L).toDF("bid")
    val global = Ann.beamSearchKnn(g, corpus, queries, "vec_id", "embedding",
      entries, beamWidth = 4, hops = 6, k = 3)
      .orderBy($"qid", $"rank").collect().toSeq
    val pairs = queries.select($"vec_id".as("qid")).crossJoin(entries)
    val perQuery = Ann.beamSearchKnn(g, corpus, queries, "vec_id", "embedding",
      entries = null, beamWidth = 4, hops = 6, k = 3, entryPairs = pairs)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(perQuery == global)
  }

  test("single-layer hnswSearch is exactly the flat beam search") {
    val n = 20
    val corpus = chain(n)
    val queries = corpus.where($"vec_id" === 19L)
    val entries = Seq(0L).toDF("bid")
    val sym = Ann.symmetrize(chainEdges(n))
    val flat = Ann.beamSearchKnn(sym, corpus, queries, "vec_id", "embedding",
      entries, beamWidth = 4, hops = n, k = 3, presymmetrized = true)
      .orderBy($"rank").collect().toSeq
    val layered = Ann.hnswSearch(Seq(sym), corpus, queries, "vec_id", "embedding",
      entries, beamUpper = 2, hopsUpper = 2, beamWidth = 4, hops = n, k = 3)
      .orderBy($"rank").collect().toSeq
    assert(layered == flat)
  }

  test("layer descent hands a far query's walk the right neighbourhood") {
    // Two layers over the chain: the upper layer is every 4th node with
    // edges between CONSECUTIVE members (stride-4 express lanes), the
    // base layer the full chain. From a single entry at node 0, a
    // 2-hop-per-layer descent alone cannot cross 19 base edges — the
    // upper layer must carry the walk into query 19's neighbourhood.
    val n = 20
    val corpus = chain(n)
    val queries = corpus.where($"vec_id" === 19L)
    val upperIds = (0 until n by 4).map(_.toLong)                   // 0,4,8,12,16
    val upper = upperIds.sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("qid", "bid")
    val out = Ann.hnswSearch(
      Seq(Ann.symmetrize(upper), Ann.symmetrize(chainEdges(n))),
      corpus, queries, "vec_id", "embedding",
      topEntries = Seq(0L).toDF("bid"),
      beamUpper = 2, hopsUpper = 4, beamWidth = 4, hops = 2, k = 3)
      .orderBy($"rank").collect()
    // upper walk reaches 16; 2 base hops from {16} reach 18 — the top-3
    // of the final beam are the exact neighbours 18, 17, 16
    assert(out.map(_.getAs[Long]("bid")).toSeq == Seq(18L, 17L, 16L))
  }

  test("descent without the upper layer strands the same walk") {
    // The negative control for the express-lane case: identical base
    // walk budget (2 hops), no upper layer — the beam stays near the
    // entry end of the chain and misses the exact neighbourhood.
    val n = 20
    val corpus = chain(n)
    val queries = corpus.where($"vec_id" === 19L)
    val out = Ann.hnswSearch(
      Seq(Ann.symmetrize(chainEdges(n))),
      corpus, queries, "vec_id", "embedding",
      topEntries = Seq(0L).toDF("bid"),
      beamUpper = 2, hopsUpper = 4, beamWidth = 4, hops = 2, k = 3)
      .orderBy($"rank").collect()
    assert(!out.map(_.getAs[Long]("bid")).contains(18L),
      "2 base hops from node 0 must not reach node 19's neighbourhood")
  }

  test("deterministic under repartitioning (full two-layer search)") {
    val n = 24
    val corpus = chain(n)
    val queries = corpus.where($"vec_id" < 3L)
    val upper = (0 until n by 4).map(_.toLong).sliding(2)
      .map(p => (p(0), p(1))).toSeq.toDF("qid", "bid")
    def run(c: org.apache.spark.sql.DataFrame) =
      Ann.hnswSearch(
        Seq(Ann.symmetrize(upper), Ann.symmetrize(chainEdges(n))),
        c, queries, "vec_id", "embedding",
        topEntries = Seq(20L).toDF("bid"),
        beamUpper = 2, hopsUpper = 2, beamWidth = 4, hops = 4, k = 3)
        .orderBy($"qid", $"rank").collect().toSeq
    assert(run(corpus) == run(corpus.repartition(7)))
  }

  test("sf0.1 recall floor: layered top-5 hits >= 90% of the exact top-5") {
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
    val n = emb.count()
    val ranks = Ann.hnswRanks(emb, "vec_id")
    val ranked = emb.join(ranks, "vec_id")
    val uppers = (3 to 1 by -1).map { lyr =>
      val members = ranked.filter($"hrank" <= Ann.layerSize(n, lyr))
        .select($"vec_id", $"label", $"embedding")
      graft.operators.Checkpoints.eager(Ann.symmetrize(
        Ann.knnGraph(members, "vec_id", "embedding", "label", k = 8, nprobe = 4)))._1
    }
    val edges0 = Ann.symmetrize(
      Ann.knnGraph(emb, "vec_id", "embedding", "label", k = 16, nprobe = 4))
    val corpus = emb.select($"vec_id", $"embedding")
    val panel = corpus.filter($"vec_id" < 10)
    val beam = Ann.hnswSearch(
      uppers :+ edges0, corpus, panel, "vec_id", "embedding",
      topEntries = ranks.filter($"hrank" <= 2).select($"vec_id".as("bid")),
      beamUpper = 2, hopsUpper = 2, beamWidth = 16, hops = 5, k = 5)
    val exact = Ann.bruteTopK(corpus, panel, "vec_id", "embedding", k = 5)
    val hits = beam.join(exact.select($"qid", $"bid"), Seq("qid", "bid"), "left_semi")
      .count()
    assert(hits >= 45L, s"recall@5 degraded: $hits/50 exact neighbours found")
  }
}
