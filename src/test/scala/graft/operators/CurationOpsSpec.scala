package graft.operators

import graft.SparkSpec
import graft.dedup.CorpusSplit
import graft.similarity.Ann
import org.apache.spark.sql.functions._

/** Round-10 curation operators: kNN-graph construction, token-budget
  * mixture sampling, leakage-safe component splits.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // Two tight clusters far apart: ids 0-2 near (1,0,0), ids 10-12 near
  // (0,1,0). With lists = the cluster label, the kNN graph must stay
  // within clusters.
  private def clusteredVecs = Seq(
    (0L, 0, Array(1.0f, 0.0f, 0.02f)),
    (1L, 0, Array(0.99f, 0.01f, 0.0f)),
    (2L, 0, Array(0.98f, 0.0f, 0.01f)),
    (10L, 1, Array(0.0f, 1.0f, 0.01f)),
    (11L, 1, Array(0.01f, 0.99f, 0.0f)),
    (12L, 1, Array(0.0f, 0.98f, 0.02f))
  ).toDF("vec_id", "label", "embedding")

  test("knnGraph: k bound, no self edges, cluster-local neighbours, symmetric mutual flags") {
    val g = Ann.knnGraph(clusteredVecs, "vec_id", "embedding", "label", k = 2, nprobe = 1)
      .collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getAs[Long]("qid") != r.getAs[Long]("bid"), "self edge")
      assert(r.getAs[Long]("rank") <= 2)
      // probed list = own cluster here, so edges never cross clusters
      assert((r.getAs[Long]("qid") < 10) == (r.getAs[Long]("bid") < 10), r.toString)
    }
    // every vector has exactly k = 2 edges (each cluster has 2 others)
    val perQ = g.groupBy(_.getAs[Long]("qid")).view.mapValues(_.length).toMap
    assert(perQ.values.forall(_ == 2), perQ.toString)
    // mutual flag is symmetric: mutual(a→b) == 1 iff edge b→a exists
    val edges = g.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("bid"))).toSet
    g.foreach { r =>
      val expected = edges.contains((r.getAs[Long]("bid"), r.getAs[Long]("qid")))
      assert(r.getAs[Long]("mutual") == (if (expected) 1L else 0L), r.toString)
    }
    // in a 3-clique top-2 graph every edge is reciprocated
    assert(g.forall(_.getAs[Long]("mutual") == 1L))
  }

  test("tokenBudgetSample: budget binds per domain, prefix-closed, deterministic") {
    val docs = (1L to 40L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L))
      .toDF("id", "dom", "toks")
    val kept = MixtureSampling
      .tokenBudgetSample(docs, "id", "dom", "toks", "s1", Map("a" -> 70L), 1000L)
      .collect()
    val aRows = kept.filter(_.getAs[String]("dom") == "a")
    val bRows = kept.filter(_.getAs[String]("dom") == "b")
    // budget 70 with 10-token docs keeps exactly 7 from domain a
    assert(aRows.length == 7, aRows.length)
    assert(aRows.map(_.getAs[Long]("cum_tokens")).max == 70L)
    // default budget 1000 > domain-b total (200): everything kept
    assert(bRows.length == 20)
    // prefix-closed: the kept set is exactly the cum_tokens <= budget
    // prefix of the md5 order — re-running with a LARGER budget must
    // preserve the smaller run's selection as a prefix
    val keptWide = MixtureSampling
      .tokenBudgetSample(docs, "id", "dom", "toks", "s1", Map("a" -> 100L), 1000L)
      .filter($"dom" === "a").collect()
    val small = aRows.map(_.getAs[Long]("id")).toSet
    val wide = keptWide.map(_.getAs[Long]("id")).toSet
    assert(small.subsetOf(wide))
    assert(wide.size == 10)
    // deterministic: identical selection on re-run
    val again = MixtureSampling
      .tokenBudgetSample(docs, "id", "dom", "toks", "s1", Map("a" -> 70L), 1000L)
      .filter($"dom" === "a").collect().map(_.getAs[Long]("id")).toSet
    assert(again == small)
  }

  test("assignByComponent: one split per component, zero cross-split edges") {
    val comps = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // component 1
      (4L, 4L), (5L, 4L), // component 4
      (6L, 6L), (7L, 7L) // singletons
    ).toDF("doc_id", "component")
    val asg = CorpusSplit.assignByComponent(comps, "component", "s", 80, 10)
    val bySplit = asg.groupBy($"component")
      .agg(countDistinct($"split").as("n")).collect()
    assert(bySplit.forall(_.getAs[Long]("n") == 1L), "a component straddles splits")
    // membership is a pure function of the component id: doc 1 and 3
    // (same component) always agree, independent of the doc set
    val sub = CorpusSplit.assignByComponent(
      comps.filter($"doc_id".isin(1L, 3L)), "component", "s", 80, 10)
    val full = asg.filter($"doc_id".isin(1L, 3L))
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.select($"doc_id", $"split").collect()
      .foreach(r => assert(full(r.getLong(0)) == r.getString(1)))
    intercept[IllegalArgumentException] {
      CorpusSplit.assignByComponent(comps, "component", "s", 90, 10)
    }
  }
}
