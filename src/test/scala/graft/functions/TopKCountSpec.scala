package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** The native one-pass top-k aggregate: distributed correctness
  * (partial/merge through a real shuffle), tie and null semantics,
  * buffer serialization, and the SQL surface.
  */
class TopKCountSpec extends SparkSpec {

  import spark.implicits._

  test("top_k_count equals the groupBy+window idiom across many partitions") {
    val rows = for {
      g <- Seq("g1", "g2"); i <- 1 to 400
    } yield (g, s"v${(i * (if (g == "g1") 7 else 11)) % 23}")
    // 16 partitions: partial buffers must merge and serialize through
    // the exchange for the result to come out right
    val df = rows.toDF("g", "v").repartition(16)
    val got = df.groupBy($"g")
      .agg(TopKCount.column(spark, $"v", 4).as("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getString(0), s.getLong(1))))
      .toMap
    // reference: two-stage count + sort
    val expected = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.groupBy(_._2).map { case (v, xs) => (v, xs.size.toLong) }
        .toSeq.sortBy { case (v, c) => (-c, v) }.take(4)
    }
    assert(got === expected)
    // single ObjectHashAggregate pass, not an extra window exchange
    val plan = df.groupBy($"g").agg(TopKCount.column(spark, $"v", 4))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.toLowerCase.contains("window"), "top-k must not need a window")
  }

  test("ties break by value ascending; nulls ignored; k beyond domain returns all") {
    val df = Seq(
      ("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c"),
      ("g", null)).toDF("g", "v")
    val top = df.groupBy($"g").agg(TopKCount.column(spark, $"v", 10).as("top"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(s => (s.getString(0), s.getLong(1)))
    assert(top === Seq(("a", 2L), ("b", 2L), ("c", 1L))) // a before b on the tie
  }

  test("SQL surface via session extensions; non-literal k is a clean analysis error") {
    TopKCount.register(spark)
    val out = spark.sql(
      "SELECT top_k_count(v, 2) AS top FROM VALUES ('x'),('x'),('y'),('z') AS t(v)")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(s => (s.getString(0), s.getLong(1)))
    assert(out === Seq(("x", 2L), ("y", 1L)))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT top_k_count(v) FROM VALUES ('x') AS t(v)").collect()
    }
    assert(ex.getMessage.contains("top_k_count"))
  }

  test("buffer serialization round-trips exactly") {
    val agg = TopKCount(org.apache.spark.sql.catalyst.expressions.Literal("x"), 3)
    val buf = agg.createAggregationBuffer()
    Seq("alpha" -> 5L, "beta" -> 2L, "" -> 7L, "β-unicode" -> 1L).foreach {
      case (s, c) => buf.update(UTF8String.fromString(s), c)
    }
    val restored = agg.deserialize(agg.serialize(buf))
    assert(restored.map { case (k, v) => k.toString -> v } ===
      buf.map { case (k, v) => k.toString -> v })
  }
}
