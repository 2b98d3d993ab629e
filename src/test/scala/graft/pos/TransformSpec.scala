package graft.pos

import graft.SparkSpec
import org.apache.spark.sql.Row

/** F1 flatten, C1 cascade vs C2 first-match, A10 time slots, P3 clean —
  * fixture edge cases from FIXTURES.md §1, §3, §5.
  */
class TransformSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def rawReceipts(rows: Seq[Row]) =
    spark.createDataFrame(rows.asJava, Schemas.rawReceipt)

  private def receipt(
      num: String,
      date: String,
      order: String,
      payments: Seq[String],
      items: Seq[Row]): Row =
    Row(num, date, date, date, order,
      payments.map(p => Row(p)), items)

  private def li(name: String, mods: Seq[(String, String)]): Row =
    Row(name, 10.0, 20.0, 20.0, mods.map { case (n, o) => Row(n, o) })

  test("F1: one row per line item, ;-joins, empty modifiers → null, date/time split") {
    val df = rawReceipts(Seq(
      receipt("1-1", "2025-07-21T10:30:05Z", "Mesa 01", Seq("CASH", "CARD"),
        Seq(li("Burger", Seq("Mayonesa" -> "Ajo", "Queso" -> "Extra")), li("Refresco", Seq.empty))),
      receipt("1-2", "2025-07-21T11:00:00Z", "A domicilio", Seq.empty, Seq.empty) // no items → vanishes
    ))
    val out = Transform.flatten(df).collect()
    assert(out.length === 2)
    val burger = out.find(_.getAs[String]("item_name") == "Burger").get
    assert(burger.getAs[String]("date") === "2025-07-21")
    assert(burger.getAs[String]("time") === "10:30:05")
    assert(burger.getAs[String]("payment_type") === "CASH;CARD")
    assert(burger.getAs[String]("modifiers") === "Mayonesa(Ajo);Queso(Extra)")
    val refresco = out.find(_.getAs[String]("item_name") == "Refresco").get
    assert(refresco.getAs[String]("modifiers") === null)
  }

  test("C1 cascade: '01' double-rewrites to 'Para llevar'; order matters") {
    import spark.implicits._
    val df = Seq("Mesa 01", "Mesa 2 - terraza", "A domicilio rappi", "Para Llevar",
      "Mesa 5", null).toDF("order_type")
    val out = Transform.homogenizeOrderTypes(df).collect().map(_.getString(0))
    // Mesa 01: rule1 → "Para Llevar" … rule4 contains "Llevar" → "Para llevar"
    assert(out(0) === "Para llevar")
    // "-" → "Mesa 2" (rule2), survives later rules
    assert(out(1) === "Mesa 2")
    assert(out(2) === "A domicilio")
    assert(out(3) === "Para llevar")
    assert(out(4) === "Mesa 5") // untouched passthrough
    assert(out(5) === null)     // na=False: null stays null
  }

  test("C2 first-match: '-' wins over 'domicilio', '01' maps directly") {
    import spark.implicits._
    val df = Seq("Mesa 2 - a domicilio", "Mesa 01").toDF("order_type")
    val out = Transform.homogenizeOrderTypesFirstMatch(df).collect().map(_.getString(0))
    assert(out(0) === "Mesa")          // first-match: "-" before "domicilio"
    assert(out(1) === "Para llevar")   // no cascade: straight to final form
  }

  test("A10: −6h fixed shift, minutes past midnight, left-closed hourly slots") {
    import spark.implicits._
    val df = Seq(
      ("2025-07-21", "06:00:00"),  // shifted 00:00 → slot 00:00-01:00
      ("2025-07-21", "06:59:59"),  // shifted 00:59:59 → 00:00-01:00
      ("2025-07-22", "05:59:00"),  // shifted 23:59 prev day → 23:00-24:00
      ("2025-07-21", "18:30:00")   // shifted 12:30 → 12:00-13:00
    ).toDF("date", "time")
    val out = Transform.timeSlots(df).collect()
    assert(out.map(_.getAs[String]("time_slot")).toSeq ===
      Seq("00:00-01:00", "00:00-01:00", "23:00-24:00", "12:00-13:00"))
    assert(out.map(_.getAs[Long]("minutes_past_midnight")).toSeq ===
      Seq(0L, 59L, 23L * 60 + 59, 12L * 60 + 30))
    assert(out(2).getAs[java.sql.Timestamp]("shifted_time").toInstant.toString
      === "2025-07-21T23:59:00Z")
  }

  test("run: full chain emits the curated column order") {
    val df = rawReceipts(Seq(
      receipt("1-1", "2025-07-21T10:30:05Z", "Mesa 01", Seq("CASH"),
        Seq(li("Burger", Seq("Mayonesa" -> "Ajo"))))))
    val out = Transform.run(df)
    assert(out.columns.toSeq === Schemas.curatedColumns)
    val r = out.collect().head
    assert(r.getAs[String]("order_type") === "Para llevar")
    assert(r.getAs[String]("time_slot") === "04:00-05:00") // 10:30 − 6h
  }

  test("P3 clean: coerce/drop/fill + day_of_week/hour_of_day (fixture A)") {
    import spark.implicits._
    val df = Seq(
      ("R1", "2025-07-21 10:00:00", "Combo Hamburguesa", "150.0", "70.0"),
      ("R1", "2025-07-21 10:00:00", "Refresco", "25.0", null),
      ("R2", "not-a-date", "Papas Fritas", "oops", "20.0"),
      (null, "2025-07-21 11:00:00", "Papas Fritas", "50.0", "20.0")
    ).toDF("receipt_number", "datetime", "item_name", "price", "cost")
    val out = Transform.cleanForReporting(df)
    val rows = out.collect()
    assert(rows.length === 2) // bad datetime + null receipt dropped
    assert(out.schema("price").dataType.typeName === "double")
    val r1 = rows.find(_.getAs[String]("item_name") == "Refresco").get
    assert(r1.getAs[Double]("cost") === 0.0)   // null → 0
    assert(r1.getAs[String]("day_of_week") === "Monday")
    assert(r1.getAs[Int]("hour_of_day") === 10)
  }
}
