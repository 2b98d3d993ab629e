package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Ann.beamSearchKnn]] — graph-based ANN serving (HNSW layer-0
  * search over the symmetrized kNN graph): navigation correctness on a
  * hand-built chain graph, the symmetrization contract (a directed
  * edge is walkable both ways), determinism under repartitioning, and
  * the sf0.1 recall floor the e21 gate's `hit` column measures.
  */
class BeamSearchSpec extends SparkSpec {
  import spark.implicits._

  // A 1-D chain: vector i = (cos θᵢ, sin θᵢ) with θᵢ = i·10°, so
  // cosine similarity decays monotonically with |i − j| and the exact
  // nearest neighbours of i are i±1, i±2, … — a graph walk from one
  // end must traverse the chain to reach a far query's neighbourhood.
  private def chain(n: Int) = {
    (0 until n).map { i =>
      val th = math.toRadians(10.0 * i)
      (i.toLong, Array(math.cos(th).toFloat, math.sin(th).toFloat))
    }.toDF("vec_id", "embedding")
  }

  // Directed chain edges i → i+1 only; symmetrization must make the
  // walk possible in both directions.
  private def chainEdges(n: Int) =
    (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("qid", "bid")

  test("beam search walks the chain to the exact neighbourhood") {
    val n = 20
    val corpus = chain(n)
    val queries = corpus.where($"vec_id" === 19L)
    val out = Ann.beamSearchKnn(
      chainEdges(n), corpus, queries, "vec_id", "embedding",
      entries = Seq(0L).toDF("bid"),
      beamWidth = 4, hops = n, k = 3)
      .orderBy($"rank").collect()
    // query 19's exact top-3 are 18, 17, 16
    assert(out.map(_.getAs[Long]("bid")).toSeq == Seq(18L, 17L, 16L))
  }

  test("symmetrized edges walk a forward-only chain backwards") {
    val n = 12
    val corpus = chain(n)
    val queries = corpus.where($"vec_id" === 0L)
    // entry at the FAR end: only the REVERSED edges lead back to 0's
    // neighbourhood (directed edges all point away from it)
    val out = Ann.beamSearchKnn(
      chainEdges(n), corpus, queries, "vec_id", "embedding",
      entries = Seq((n - 1).toLong).toDF("bid"),
      beamWidth = 4, hops = n, k = 3)
      .orderBy($"rank").collect()
    assert(out.map(_.getAs[Long]("bid")).toSeq == Seq(1L, 2L, 3L))
  }

  test("hops bound the walk: zero hops returns the re-ranked entries") {
    val n = 10
    val corpus = chain(n)
    val queries = corpus.where($"vec_id" === 9L)
    val out = Ann.beamSearchKnn(
      chainEdges(n), corpus, queries, "vec_id", "embedding",
      entries = Seq(0L, 5L).toDF("bid"),
      beamWidth = 4, hops = 0, k = 2)
      .orderBy($"rank").collect()
    // no expansion: just the two entries ranked by cosine to query 9
    assert(out.map(_.getAs[Long]("bid")).toSeq == Seq(5L, 0L))
  }

  test("deterministic under repartitioning") {
    val corpus = chain(24)
    val queries = corpus.where($"vec_id" < 3L)
    def run(c: org.apache.spark.sql.DataFrame, g: org.apache.spark.sql.DataFrame) =
      Ann.beamSearchKnn(g, c, queries, "vec_id", "embedding",
        entries = Seq(23L, 11L).toDF("bid"),
        beamWidth = 4, hops = 6, k = 3)
        .orderBy($"qid", $"rank").collect().toSeq
    val a = run(corpus, chainEdges(24))
    val b = run(corpus.repartition(7), chainEdges(24).repartition(5))
    assert(a == b)
  }

  test("presymmetrized serving over Ann.symmetrize equals the in-query symmetrization") {
    // the e21b build/serve split: symmetrize-at-build + presymmetrized
    // walk must be bit-identical to the default in-query union+distinct
    val n = 24
    val corpus = chain(n)
    val queries = corpus.where($"vec_id" < 3L)
    val g = chainEdges(n)
    def run(edges: org.apache.spark.sql.DataFrame, presym: Boolean) =
      Ann.beamSearchKnn(edges, corpus, queries, "vec_id", "embedding",
        entries = Seq(23L, 11L).toDF("bid"),
        beamWidth = 4, hops = 6, k = 3, presymmetrized = presym)
        .orderBy($"qid", $"rank").collect().toSeq
    assert(run(Ann.symmetrize(g), presym = true) == run(g, presym = false))
    // symmetrize is itself symmetric and deduplicated
    val sym = Ann.symmetrize(g).as[(Long, Long)].collect().toSet
    assert(sym == sym.map(_.swap), "symmetrize output is not symmetric")
    assert(Ann.symmetrize(g).count() == sym.size.toLong, "duplicate edges survived")
  }

  test("sf0.1 recall floor: beam top-5 hits >= 90% of the exact top-5") {
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
    val g = Ann.knnGraph(emb, "vec_id", "embedding", "label", k = 16, nprobe = 4)
    val corpus = emb.select($"vec_id", $"embedding")
    val panel = corpus.filter($"vec_id" < 10)
    // the gate convention: TWO entries per list (round-16 entry sweep)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"label").orderBy($"vec_id")
    val entries = emb.select($"label", $"vec_id")
      .withColumn("__r", row_number().over(w)).filter($"__r" <= 2)
      .select($"vec_id".as("bid"))
    val beam = Ann.beamSearchKnn(g, corpus, panel, "vec_id", "embedding",
      entries, beamWidth = 16, hops = 5, k = 5)
    val exact = Ann.bruteTopK(corpus, panel, "vec_id", "embedding", k = 5)
    val hits = beam.join(exact.select($"qid", $"bid"), Seq("qid", "bid"), "left_semi")
      .count()
    assert(hits >= 45L, s"recall@5 degraded: $hits/50 exact neighbours found")
  }
}
