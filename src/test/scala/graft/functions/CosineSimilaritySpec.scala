package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native expression vs HOF reference: bit-identical results, SQL
  * registration, codegen presence.
  */
class CosineSimilaritySpec extends SparkSpec {

  import spark.implicits._

  test("native cosine is bit-identical to the HOF fold on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select($"vec_id".as("ida"), $"embedding".as("va")).limit(20)
    val b = emb.select($"vec_id".as("idb"), $"embedding".as("vb"))
    val both = a.crossJoin(b).select(
      $"ida", $"idb",
      Exprs.cosine($"va", $"vb").as("native"),
      Exprs.cosineHof($"va", $"vb").as("hof"))
    val diff = both.filter(not($"native" <=> $"hof")).count()
    assert(diff === 0) // exact, not approximate
  }

  test("registered for SQL text") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT)))").collect().head.getDouble(0)
    assert(math.abs(r - 0.6) < 1e-7)
  }

  test("identical vectors → 1.0; orthogonal → 0.0") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 5.0f, 0.0f))
    ).toDF("a", "b")
    val out = df.select(Exprs.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(out(1) === 0.0)
  }
}
