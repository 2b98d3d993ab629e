package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: hand-checked integer codebooks/distances, ADC
  * recall against exact quantized L2, and partition invariance (the
  * integer arithmetic makes every value order-independent).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  test("Pq: k=1 codebook and distances match hand-computed integers") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val (codes, cents) = Pq.train(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 1, iters = 1)
    // qv rows are [127,0,0,127] and [0,127,127,0]; every (sub,pos) cell
    // averages {127,0}: c = ((127 + 254)·10^6) div 2 − 127·10^6 = 63.5e6
    val cRows = cents.collect()
    assert(cRows.length === 2)
    assert(cRows.forall(_.getAs[Seq[Long]]("centroid") == Seq(63500000L, 63500000L)))
    // dist per sub = (127e6 − 63.5e6)² + (0 − 63.5e6)² = 2·(63.5e6)²
    val want = 2L * 63500000L * 63500000L
    assert(codes.collect().forall(_.getAs[Long]("dist") === want))
    val adc = Pq.adcTopK(codes, cents, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", dim = 4, m = 2, k = 1).collect()
    assert(adc.length === 1)
    assert(adc.head.getAs[Long]("bid") === 1L)
    assert(adc.head.getAs[Long]("adist") === 2 * want)
  }

  test("Pq: ADC top-5 contains the exact quantized-L2 top-1 for >=14/20 queries (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter($"vec_id" < 20)
    // exact integer L2 over the same int8 vectors PQ starts from
    val qv = Ann.quantize(emb, "embedding", "qv").select($"vec_id", $"qv")
    val exact = qv.as("a").join(qv.as("b"), $"a.vec_id" =!= $"b.vec_id")
      .where($"a.vec_id" < 20)
      .select($"a.vec_id".as("qid"), $"b.vec_id".as("bid"),
        aggregate(zip_with($"a.qv", $"b.qv", (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
          .as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"d2", $"bid")
    val exactTop1 = exact.withColumn("r", row_number().over(w)).filter($"r" === 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("bid")).toMap
    // gate config (e8/e9): m=32, k=16, iters=4 — measured 19/20 on this
    // data (18/20 at sf0.01 and sf0.1); everything is deterministic
    // integers so the value is exact, the bar leaves margin for testdata
    // regeneration only
    val (codes, cents) = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 32, k = 16, iters = 4)
    val adc5 = Pq.adcTopK(codes, cents, q, "vec_id", "embedding", dim = 64, m = 32, k = 5)
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("bid")).toSet).toMap
    val hits = exactTop1.count { case (qid, bid) => adc5(qid).contains(bid) }
    assert(hits >= 14, s"ADC recall too low: $hits/20 exact top-1s in ADC top-5")
  }

  test("Pq: results are invariant under repartitioning") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val (codes, cents) = Pq.train(df, "vec_id", "embedding", dim = 64, m = 32, k = 16, iters = 4)
      Pq.adcTopK(codes, cents, df.filter($"vec_id" % 50 === 0),
        "vec_id", "embedding", dim = 64, m = 32, k = 5)
        .collect().map(_.toSeq).toSeq
    }
    assert(run(emb) === run(emb.repartition(7)))
  }

  test("Pq: trainSampled with sampleN >= corpus reproduces full training") {
    // With the sample covering the whole corpus the sampled path must
    // degenerate to train() exactly: same codebook (NTILE init is a
    // sort, order-independent), and encode() must assign the same
    // (code, dist) to every sub-vector as the final Lloyd round did.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count().toInt
    val (fullCodes, fullCents) = Pq
      .train(emb, "vec_id", "embedding", dim = 64, m = 32, k = 16, iters = 2)
    val (sampCodes, sampCents) = Pq
      .trainSampled(emb, "vec_id", "embedding", dim = 64, m = 32, k = 16, iters = 2,
        sampleN = n)
    def cset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("sub"), r.getAs[Long]("code"),
        r.getAs[Seq[Long]]("centroid"))).toSet
    assert(cset(sampCents) === cset(fullCents))
    def aset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("sub"),
        r.getAs[Long]("code"))).toSet
    assert(aset(sampCodes) === aset(fullCodes))
  }

  test("Pq: ivfAdcTopK probing every list equals flat adcTopK") {
    // With nprobe = numLists the IVF front prunes nothing, so the
    // composed search must return exactly the flat ADC ranking — the
    // pruning is a candidate restriction, never a scoring change.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val numLists = emb.select($"label").distinct().count().toInt
    val (codes, cents) = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 32, k = 16, iters = 2)
    val q = emb.filter($"vec_id" % 50 === 0)
    val flat = Pq.adcTopK(codes, cents, q, "vec_id", "embedding", dim = 64, m = 32, k = 5)
      .collect().map(_.toSeq).toSeq
    val composed = Pq.ivfAdcTopK(codes, cents, emb, q,
      "vec_id", "embedding", "label", dim = 64, m = 32, k = 5, nprobe = numLists)
      .collect().map(_.toSeq).toSeq
    assert(composed === flat)
  }
}
