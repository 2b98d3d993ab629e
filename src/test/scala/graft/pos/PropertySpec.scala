package graft.pos

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2): flatten row-count, dedup
  * idempotence, percent-of-group totals, explode pass-through.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic sampling in place of the scalatestplus bridge (not in
    * the offline cache): fixed seeds, N samples per property.
    */
  private def forAllSamples[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(42L + i)).get)
    }

  import scala.jdk.CollectionConverters._
  import spark.implicits._

  private val genItem = for {
    name <- Gen.oneOf("Burger", "Fries", "Refresco", "Malteada")
    nMods <- Gen.choose(0, 3)
  } yield Row(name, 10.0, 20.0, 20.0,
    Seq.fill(nMods)(Row("Mayonesa", "Ajo")))

  private val genReceipt = for {
    num <- Gen.choose(1, 9999).map(n => s"1-$n")
    nItems <- Gen.choose(0, 5)
    items <- Gen.listOfN(nItems, genItem)
  } yield Row(num, "2025-07-21T10:00:00Z", "2025-07-21T10:00:00Z",
    "2025-07-21T10:00:00Z", "Mesa 01", Seq(Row("CASH")), items)

  test("F1 property: flatten row count = Σ|line_items|") {
    forAllSamples(Gen.listOfN(12, genReceipt)) { receipts =>
      val df = spark.createDataFrame(receipts.asJava, Schemas.rawReceipt)
      val expected = receipts.map(_.getAs[Seq[Row]](6).length).sum
      assert(Transform.flatten(df).count() === expected)
    }
  }

  test("V1 property: dedup is idempotent (dedup twice = once)") {
    val dup = Seq(
      ("r1", java.sql.Timestamp.valueOf("2025-07-01 10:00:00"), "A"),
      ("r1", java.sql.Timestamp.valueOf("2025-07-02 10:00:00"), "A"),
      ("r2", java.sql.Timestamp.valueOf("2025-07-01 10:00:00"), "B")
    ).toDF("receipt_number", "shifted_time", "item_name")
    val once = Analytics.dedupLatest(dup)
    val twice = Analytics.dedupLatest(once)
    assert(once.collect().sortBy(_.getString(0)).toSeq
      === twice.collect().sortBy(_.getString(0)).toSeq)
  }

  test("V3 property: percent-of-group sums to 100 per partition") {
    forAllSamples(Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf("Burger", "Smash X")))) { pairs =>
      {
        val df = pairs.toDF("receipt_number", "item_name")
          .withColumn("modifiers", org.apache.spark.sql.functions.lit("Mayonesa(Ajo)"))
        val out = Analytics.mayoPctAndCounts(df).collect()
        out.groupBy(_.getAs[String]("item_name")).values.foreach { rows =>
          assert(math.abs(rows.map(_.getAs[Double]("percentage")).sum - 100.0) < 1e-9)
        }
      }
    }
  }

  test("G1 property: non-combo rows always pass through unchanged") {
    forAllSamples(Gen.listOfN(10, Gen.oneOf("Burger", "Fries", "Malteada"))) { names =>
      val df = names.zipWithIndex.map { case (n, i) => (s"r$i", n, 10.0, 5.0, "Mayonesa(Ajo)") }
        .toDF("receipt_number", "item_name", "price", "cost", "modifiers")
      val out = ComboExplode.explodeComboItems(df)
      assert(out.count() === names.length)
      assert(out.agg(org.apache.spark.sql.functions.sum("price")).collect().head.getDouble(0)
        === names.length * 10.0)
    }
  }
}
