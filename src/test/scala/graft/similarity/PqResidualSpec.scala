package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Residual IVF-PQ (e15/e16): hand-checked integer coarse centroids
  * and residuals, plus the claim the tier exists for — at sf0.1 (the
  * one test scale whose lists have enough population for within-list
  * structure), residual encoding recalls at least 2 more exact top-1s
  * than the flat codebook at equal nprobe. Everything in the chain is
  * exact integers or 6-dp-rounded probe scores, so the measured values
  * (flat 14/20 → residual 18/20 at nprobe=8) are deterministic; the
  * ≥2 bar leaves margin for testdata regeneration only.
  */
class PqResidualSpec extends SparkSpec {
  import spark.implicits._

  test("Pq: integer coarse centroids and residuals match hand-computed values") {
    val vecs = Seq(
      (0L, 7, Array(1.0f, 0.0f)),
      (1L, 7, Array(0.0f, 1.0f)),
      (2L, 9, Array(-1.0f, -1.0f))
    ).toDF("vec_id", "label", "embedding")
    val coarse = Pq.coarseIntCentroids(vecs, "embedding", "label")
    val byList = coarse.collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[scala.collection.Seq[Long]]("cint").toSeq)
      .toMap
    // list 7: qv rows [127,0] and [0,127] → per-dim floor((127+254)/2)−127 = 63
    assert(byList(7) == Seq(63L, 63L))
    // list 9: qv row [-127,-127] → exactly -127
    assert(byList(9) == Seq(-127L, -127L))
    val res = Pq.residuals(vecs, coarse, "vec_id", "embedding", "label")
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[scala.collection.Seq[Long]]("rv").toSeq)
      .toMap
    assert(res(0L) == Seq(127L - 63L, 0L - 63L))
    assert(res(1L) == Seq(0L - 63L, 127L - 63L))
    assert(res(2L) == Seq(0L, 0L))
  }

  test("Pq: residual codebook beats flat by >=2 hits at nprobe=8 (sf0.1)") {
    val d = "/root/testdata/sf0.1"
    val emb = graft.Tables.embeddings(spark, d)
    val corpus = emb.select($"vec_id", $"label", $"embedding")
    val queries = emb.filter($"vec_id" < 20)
    val qv = Ann.quantize(emb, "embedding", "qv").select($"vec_id", $"qv")
    val exact = qv.as("a").join(qv.as("b"), $"a.vec_id" =!= $"b.vec_id")
      .where($"a.vec_id" < 20)
      .select($"a.vec_id".as("qid"), $"b.vec_id".as("bid"),
        aggregate(zip_with($"a.qv", $"b.qv", (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
          .as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"d2", $"bid")
    val exactTop1 = exact.withColumn("r", row_number().over(w)).filter($"r" === 1)
      .select($"qid", $"bid")

    def hits(top5: org.apache.spark.sql.DataFrame): Long =
      exactTop1.join(top5.select($"qid", $"bid"), Seq("qid", "bid"), "left_semi")
        .agg(count(lit(1))).as[Long].head()

    val (fcodes, fcents) = {
      val (_, cents) = Pq.train(
        Pq.sampleDeterministic(emb, "vec_id", 200),
        "vec_id", "embedding", dim = 64, m = 32, k = 16, iters = 4)
      (Pq.encode(emb, cents, "vec_id", "embedding", dim = 64, m = 32), cents)
    }
    val flat8 = hits(Pq.ivfAdcTopK(fcodes, fcents, corpus, queries,
      "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = 8))

    val (rcodes, rcents, coarse) = Pq.trainSampledResidual(
      corpus, "vec_id", "embedding", "label",
      dim = 64, m = 32, k = 16, iters = 4, sampleN = 200)
    val res8 = hits(Pq.ivfAdcResidualTopK(rcodes, rcents, coarse, corpus, queries,
      "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = 8))

    assert(res8 >= flat8 + 2,
      s"residual gain collapsed: flat=$flat8/20 residual=$res8/20 at nprobe=8")
  }
}
