package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The list-rebalance contracts: only over-full lists move, the split
  * halves the hot list, untouched assignments pass through unchanged,
  * and the pass is deterministic.
  */
class RebalanceSpec extends SparkSpec {
  import spark.implicits._

  // 2 well-separated clusters crammed into ONE list + a small cold list:
  // the 2-means must rediscover the cluster structure.
  private def mk(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val rows = (0L until 40L).map { i =>
      val vec =
        if (i < 20L) Array(1.0f, 0.1f * (i % 5), 0.0f)   // cluster around +x
        else Array(-1.0f, 0.0f, 0.1f * (i % 5))           // cluster around -x
      (i, vec, 0L)
    } ++ (100L until 105L).map(i => (i, Array(0.0f, 1.0f, 0.0f), 1L))
    val df = rows.toDF("vec_id", "embedding", "list")
    (df.select($"vec_id", $"list"), df.select($"vec_id", $"embedding"))
  }

  test("over-full list splits into its two geometric clusters; cold list untouched") {
    val (asn, vecs) = mk()
    val out = Rebalance.splitLists(asn, vecs, "vec_id", "embedding", "list",
      maxListSize = 30L, newListOffset = 2L)
    val got = out.as[(Long, Long)].collect().toMap
    // cold list unchanged
    (100L until 105L).foreach(i => assert(got(i) == 1L))
    // hot list split exactly along the two clusters: seed A is vec 0
    // (+x side), so the +x cluster keeps list 0, -x moves to 0+2=2
    (0L until 20L).foreach(i => assert(got(i) == 0L, s"vec $i"))
    (20L until 40L).foreach(i => assert(got(i) == 2L, s"vec $i"))
    // max list size now bounded
    val sizes = out.groupBy($"list").count().as[(Long, Long)].collect().toMap
    assert(sizes.values.max <= 20L)
  }

  test("rebalance is deterministic and total (every vector keeps exactly one row)") {
    val (asn, vecs) = mk()
    def run() = Rebalance.splitLists(asn, vecs, "vec_id", "embedding", "list", 30L, 2L)
      .orderBy($"vec_id").as[(Long, Long)].collect().toSeq
    val a = run(); val b = run()
    assert(a == b)
    assert(a.map(_._1) == asn.orderBy($"vec_id").as[(Long, Long)].collect().toSeq.map(_._1))
  }

  test("no list over threshold → identity assignment") {
    val (asn, vecs) = mk()
    val out = Rebalance.splitLists(asn, vecs, "vec_id", "embedding", "list",
      maxListSize = 100L, newListOffset = 2L)
      .orderBy($"vec_id").as[(Long, Long)].collect().toSeq
    assert(out == asn.orderBy($"vec_id").as[(Long, Long)].collect().toSeq)
  }

  test("identical-vector over-full list halves by id parity (every pass makes progress)") {
    // 2-means can't separate identical vectors: without the fallback the
    // whole list lands in sub 0 and re-running the pass never converges.
    val rows = (0L until 16L).map(i => (i, Array(1.0f, 0.0f, 0.0f), 0L))
    val df = rows.toDF("vec_id", "embedding", "list")
    val out = Rebalance.splitLists(
      df.select($"vec_id", $"list"), df.select($"vec_id", $"embedding"),
      "vec_id", "embedding", "list", maxListSize = 10L, newListOffset = 1L)
    val got = out.as[(Long, Long)].collect().toMap
    assert(got.size == 16)
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map(0L -> 8, 1L -> 8), s"got $sizes")
    // odd row_number (= even ids here, ordered by id from 0) stays
    (0L until 16L).foreach(i => assert(got(i) == (i % 2), s"vec $i"))
  }

  test("k-way split separates three clusters in ONE pass (2-way would need two)") {
    val rows = (0L until 60L).map { i =>
      val vec =
        if (i < 20L) Array(1.0f, 0.1f * (i % 5), 0.0f)
        else if (i < 40L) Array(-1.0f, 0.0f, 0.1f * (i % 5))
        else Array(0.0f, 1.0f, 0.1f * (i % 5))
      (i, vec, 0L)
    }
    val df = rows.toDF("vec_id", "embedding", "list")
    // 60 > 25 ⇒ k = ceil(60/25) = 3 sub-lists in one pass
    val (out, cents) = Rebalance.splitListsK(
      df.select($"vec_id", $"list"), df.select($"vec_id", $"embedding"),
      "vec_id", "embedding", "list", maxListSize = 25L, newListOffset = 1L)
    val got = out.as[(Long, Long)].collect().toMap
    assert(got.size == 60)
    // cluster-pure: positional init aligns with the id-contiguous
    // clusters and Lloyd keeps them
    (0L until 20L).foreach(i => assert(got(i) == 0L, s"vec $i"))
    (20L until 40L).foreach(i => assert(got(i) == 1L, s"vec $i"))
    (40L until 60L).foreach(i => assert(got(i) == 2L, s"vec $i"))
    // servable: one centroid per produced sub-list
    assert(cents.select($"list").as[Long].collect().toSet == Set(0L, 1L, 2L))
  }

  test("k-way split of an identical-vector list keeps the balanced positional init") {
    // Lloyd's (cosine DESC, sub ASC) argmax ties every identical row
    // back to sub 0, undoing the init — the degenerate fallback must
    // keep the contiguous id-run split so the pass makes progress.
    val rows = (0L until 20L).map(i => (i, Array(1.0f, 0.0f, 0.0f), 0L))
    val df = rows.toDF("vec_id", "embedding", "list")
    // 20 > 5 ⇒ k = 4 sub-lists
    val (out, cents) = Rebalance.splitListsK(
      df.select($"vec_id", $"list"), df.select($"vec_id", $"embedding"),
      "vec_id", "embedding", "list", maxListSize = 5L, newListOffset = 1L)
    val got = out.as[(Long, Long)].collect().toMap
    assert(got.size == 20)
    // positional init: rank r (1-based by id) → sub ⌊(r−1)·4/20⌋
    (0L until 20L).foreach(i => assert(got(i) == i / 5, s"vec $i"))
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map(0L -> 5, 1L -> 5, 2L -> 5, 3L -> 5), s"got $sizes")
    assert(cents.select($"list").as[Long].collect().toSet == Set(0L, 1L, 2L, 3L))
  }

  test("mixed pass: degenerate list splits positionally while a normal list splits by geometry") {
    val rows =
      (0L until 12L).map(i => (i, Array(0.0f, 0.0f, 1.0f), 0L)) ++      // degenerate
      (100L until 106L).map(i => (i, Array(1.0f, 0.1f * (i % 3), 0.0f), 1L)) ++
      (106L until 112L).map(i => (i, Array(-1.0f, 0.0f, 0.1f * (i % 3)), 1L)) // 2 clusters
    val df = rows.toDF("vec_id", "embedding", "list")
    // both lists over 6 ⇒ k = 2 each, via the k-way code path
    val (out, _) = Rebalance.splitListsK(
      df.select($"vec_id", $"list"), df.select($"vec_id", $"embedding"),
      "vec_id", "embedding", "list", maxListSize = 6L, newListOffset = 10L)
    val got = out.as[(Long, Long)].collect().toMap
    (0L until 6L).foreach(i => assert(got(i) == 0L, s"vec $i"))
    (6L until 12L).foreach(i => assert(got(i) == 10L, s"vec $i"))
    // the geometric list separates its clusters (init is already
    // cluster-aligned by id runs; Lloyd preserves it)
    (100L until 106L).foreach(i => assert(got(i) == 1L, s"vec $i"))
    (106L until 112L).foreach(i => assert(got(i) == 11L, s"vec $i"))
  }

  test("servable form: split-list centroids equal a from-scratch rebuild's") {
    val (asn, vecs) = mk()
    val (newAsn, splitCents) = Rebalance.splitListsServable(
      asn, vecs, "vec_id", "embedding", "list", maxListSize = 30L, newListOffset = 2L)
    // touched ids are exactly the kept id and the offset id of the split list
    val touched = splitCents.select($"list").as[Long].collect().toSet
    assert(touched == Set(0L, 2L))
    // incremental refresh (old router minus touched ∪ splitCents) must equal
    // centroids recomputed from scratch over the final assignment
    def rounded(df: org.apache.spark.sql.DataFrame) =
      df.select($"list", transform($"centroid", x => round(x, 6)).as("centroid"))
    val oldRouter = rounded(Ann.centroids(
      asn.join(vecs, "vec_id").select($"list", $"embedding"), "list", "embedding"))
    val refreshed = oldRouter.join(splitCents.select($"list"), Seq("list"), "left_anti")
      .unionByName(splitCents)
    val scratch = rounded(Ann.centroids(
      newAsn.join(vecs, "vec_id").select($"list", $"embedding"), "list", "embedding"))
    val a = refreshed.orderBy($"list").as[(Long, Seq[Double])].collect().toSeq
    val b = scratch.orderBy($"list").as[(Long, Seq[Double])].collect().toSeq
    assert(a == b)
  }

  test("a query probing a split list serves the same top-k as a from-scratch build") {
    val (asn, vecs) = mk()
    val (newAsn, splitCents) = Rebalance.splitListsServable(
      asn, vecs, "vec_id", "embedding", "list", maxListSize = 30L, newListOffset = 2L)
    val corpus = newAsn.join(vecs, "vec_id")
    // PQ codebook frozen across the rebalance (dim 3 doesn't divide into
    // the gate config — use m = 3, dsub = 1, 4 codes)
    val cents = Pq.train(corpus, "vec_id", "embedding", dim = 3, m = 3, k = 4, iters = 2)._2
    val packed = Pq.packCodes(
      Pq.encode(corpus, cents, "vec_id", "embedding", dim = 3, m = 3), "vec_id")
      .join(newAsn, "vec_id")
    val queries = vecs.filter($"vec_id".isin(0L, 25L, 102L))
    def rounded(df: org.apache.spark.sql.DataFrame) =
      df.select($"list", transform($"centroid", x => round(x, 6)).as("centroid"))
    val oldRouter = rounded(Ann.centroids(
      asn.join(vecs, "vec_id").select($"list", $"embedding"), "list", "embedding"))
    val refreshed = oldRouter.join(splitCents.select($"list"), Seq("list"), "left_anti")
      .unionByName(splitCents)
    val scratch = rounded(Ann.centroids(
      corpus.select($"list", $"embedding"), "list", "embedding"))
    def serve(router: org.apache.spark.sql.DataFrame) =
      Pq.ivfAdcTopKPacked(packed, cents, router, queries,
        "vec_id", "embedding", "list", dim = 3, m = 3, k = 3, nprobe = 1, nCodes = 4)
        .as[(Long, Long, Long, Long)].collect().toSeq
    val viaRefreshed = serve(refreshed)
    val viaScratch = serve(scratch)
    assert(viaRefreshed == viaScratch)
    assert(viaRefreshed.nonEmpty)
    // the split list's new id must actually be served: query 25 sits in the
    // -x cluster, which moved to list 2 — its neighbours come from there
    val q25 = viaRefreshed.filter(_._1 == 25L).map(_._3)
    val lists = newAsn.as[(Long, Long)].collect().toMap
    assert(q25.nonEmpty && q25.forall(b => lists(b) == 2L))
  }
}
