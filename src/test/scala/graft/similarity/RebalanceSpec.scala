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
}
