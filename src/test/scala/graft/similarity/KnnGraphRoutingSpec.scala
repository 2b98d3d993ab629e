package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** knnGraphRebalanced's per-pass split routing: uniform growth
  * (k = ⌈max-list/target⌉ > 2) takes the one-pass k-way split, sparse
  * drift stays on the seeded 2-means; and the gate-pinning guard
  * (`assertPasses`) fails loudly instead of hash-diverging when a
  * corpus outgrows the oracle's one-2-way-pass replay.
  */
class KnnGraphRoutingSpec extends SparkSpec {
  import spark.implicits._

  // 3 well-separated clusters crammed into ONE list: target 25 forces
  // k = ⌈60/25⌉ = 3 — the k-way routing regime.
  private def threeClusters() = {
    val rows = (0L until 60L).map { i =>
      val vec =
        if (i < 20L) Array(1.0f, 0.1f * (i % 5), 0.0f)
        else if (i < 40L) Array(-1.0f, 0.0f, 0.1f * (i % 5))
        else Array(0.0f, 1.0f, 0.1f * (i % 5))
      (i, vec, 0L)
    }
    rows.toDF("vec_id", "embedding", "list")
  }

  test("k > 2 routes through the k-way split: cluster-local graph in one pass") {
    val corpus = threeClusters()
    val g = Ann.knnGraphRebalanced(corpus, "vec_id", "embedding", "list",
      k = 2, nprobe = 1, targetListSize = 25L)
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(g.map(_._1).distinct.length == 60)
    // the k-way split separates the 3 clusters (RebalanceSpec pins the
    // assignment); with nprobe 1 every neighbour must be cluster-local
    def cl(id: Long) = id / 20L
    g.foreach { case (qid, _, bid, _, _) =>
      assert(cl(qid) == cl(bid), s"cross-cluster edge $qid -> $bid")
    }
    // deterministic
    val g2 = Ann.knnGraphRebalanced(corpus, "vec_id", "embedding", "list",
      k = 2, nprobe = 1, targetListSize = 25L)
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(g.sortBy(e => (e._1, e._2)).toSeq == g2.sortBy(e => (e._1, e._2)).toSeq)
  }

  test("assertPasses pins the oracle shape: k-way corpus throws instead of diverging") {
    val corpus = threeClusters()
    val ex = intercept[IllegalStateException] {
      Ann.knnGraphRebalanced(corpus, "vec_id", "embedding", "list",
        k = 2, nprobe = 1, targetListSize = 25L, assertPasses = 1)
    }
    assert(ex.getMessage.contains("2-way oracle"))
  }

  test("assertPasses throws when a second pass would be needed") {
    // 25-vs-5 clusters in one list, target 16: k = ⌈30/16⌉ = 2, but the
    // geometric 2-means splits 25/5 and the 25-side stays over target —
    // a second pass is needed, which assertPasses = 1 must refuse.
    val rows = (0L until 25L).map(i => (i, Array(1.0f, 0.01f * (i % 5), 0.0f), 0L)) ++
      (25L until 30L).map(i => (i, Array(-1.0f, 0.0f, 0.01f * (i % 5)), 0L))
    val corpus = rows.toDF("vec_id", "embedding", "list")
    val ex = intercept[IllegalStateException] {
      Ann.knnGraphRebalanced(corpus, "vec_id", "embedding", "list",
        k = 2, nprobe = 1, targetListSize = 16L, assertPasses = 1)
    }
    assert(ex.getMessage.contains("pass 2"))
    // without the pin the loop converges on its own
    val g = Ann.knnGraphRebalanced(corpus, "vec_id", "embedding", "list",
      k = 2, nprobe = 1, targetListSize = 16L)
    assert(g.select($"qid").distinct().count() == 30L)
  }
}
