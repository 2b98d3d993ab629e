package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused ADC loop vs the (sub, code)-join + sum plan it replaced:
  * bit-identical adist for every (query, candidate) pair on real
  * embeddings, plus a hand-checked value.
  */
class AdcLutSumSpec extends SparkSpec {

  import spark.implicits._

  test("fused ADC equals the join+sum plan on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (dim, m, k) = (64, 32, 16)
    val (codes, cents) = graft.similarity.Pq
      .trainSampled(emb, "vec_id", "embedding", dim, m, k, iters = 2, sampleN = 100)
    val queries = emb.filter($"vec_id" < 10)

    // Reference: the pre-round-9 explode-join-aggregate plan.
    val lut = graft.similarity.Pq.subvectors(queries, "vec_id", "embedding", dim, m)
      .withColumnRenamed("vec_id", "qid")
      .join(broadcast(cents), Seq("sub"))
      .select($"qid", $"sub", $"code",
        aggregate(
          zip_with($"svec", $"centroid", (v, c) => (v * 1000000L - c) * (v * 1000000L - c)),
          lit(0L), _ + _).as("qd"))
    val reference = codes.select($"vec_id".as("bid"), $"sub", $"code")
      .join(broadcast(lut), Seq("sub", "code"))
      .filter($"qid" =!= $"bid")
      .groupBy($"qid", $"bid")
      .agg(sum($"qd").as("ref_adist"))

    // Fused path, via the public top-k with k = corpus size (no cut).
    val fused = graft.similarity.Pq
      .adcTopK(codes, cents, queries, "vec_id", "embedding", dim, m, k = 100000)
      .select($"qid", $"bid", $"adist")

    val joined = reference.join(fused, Seq("qid", "bid"), "full_outer")
    assert(joined.filter($"ref_adist".isNull || $"adist".isNull).count() === 0)
    assert(joined.filter(not($"ref_adist" <=> $"adist")).count() === 0)
  }

  test("hand-checked lookup") {
    AdcLutSum.register(spark)
    // m=2, nCodes=3: codes [2, 0]; lut rows sub0=[10,20,30], sub1=[40,50,60]
    val r = spark.sql(
      "SELECT adc_lut_sum(array(2L, 0L), array(10L, 20L, 30L, 40L, 50L, 60L), 3)")
      .collect().head.getLong(0)
    assert(r === 30L + 40L)
  }
}
