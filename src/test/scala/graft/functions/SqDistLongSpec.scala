package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native squared-L2 expression vs HOF reference: bit-identical results
  * (exact integer arithmetic, so equality is ===, not approximate),
  * SQL registration, hand-checked values.
  */
class SqDistLongSpec extends SparkSpec {

  import spark.implicits._

  test("native sq_dist_long is identical to the HOF fold on quantized embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qv = graft.similarity.Ann.quantize(emb, "embedding", "qv")
      .select($"vec_id", $"qv")
    val a = qv.select($"vec_id".as("ida"), $"qv".as("va")).limit(20)
    val b = qv.select($"vec_id".as("idb"), $"qv".as("vb"))
    val both = a.crossJoin(b).select(
      $"ida", $"idb",
      Exprs.sqDistLong($"va", $"vb").as("native"),
      Exprs.sqDistLongHof($"va", $"vb").as("hof"))
    assert(both.filter(not($"native" <=> $"hof")).count() === 0)
  }

  test("registered for SQL text") {
    SqDistLong.register(spark)
    val r = spark.sql(
      "SELECT sq_dist_long(array(1L, 2L, 3L), array(4L, 0L, 3L))")
      .collect().head.getLong(0)
    assert(r === 13L) // 3² + 2² + 0²
  }

  test("zero distance to self; length mismatch uses common prefix") {
    val df = Seq(
      (Array(5L, -7L, 9L), Array(5L, -7L, 9L)),
      (Array(1L, 2L), Array(1L, 2L, 100L))
    ).toDF("a", "b")
    val out = df.select(Exprs.sqDistLong($"a", $"b")).collect().map(_.getLong(0))
    assert(out(0) === 0L)
    assert(out(1) === 0L)
  }
}
