package graft.pos

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import java.sql.Timestamp

/** P-relation semantics on a small curated fixture. */
class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (receipt, shifted_time, order_type, item_name, price, total_money, modifiers)
  lazy val curated: DataFrame = Seq(
    ("r1", ts("2025-07-01 12:00:00"), "Mesa 2", "Smash Burger", 100.0, 100.0, "Mayonesa(Ajo)"),
    ("r1", ts("2025-07-01 12:00:00"), "Mesa 2", "Refresco Coca", 25.0, 25.0, null),
    ("r2", ts("2025-07-02 13:00:00"), "A domicilio", "Chicken Burger", 110.0, 110.0, "Mayonesa(Sin Mayonesa)"),
    ("r3", ts("2025-07-04 20:00:00"), "Para llevar", "Smash Burger", 100.0, 100.0, "Mayonesa(Chipotle)"),
    ("r4", ts("2025-08-01 12:30:00"), "mesa vip", "Malteada Fresa", 60.0, 60.0, null),
    ("r5", ts("2025-08-02 19:00:00"), "desconocido", "Agua natural", 20.0, 20.0, null)
  ).toDF("receipt_number", "shifted_time", "order_type", "item_name", "price", "total_money", "modifiers")

  test("P1 top products: count desc") {
    val top = Analytics.topProducts(curated, 2).collect()
    assert(top.head.getAs[String]("item_name") === "Smash Burger")
    assert(top.head.getAs[Long]("items_sold") === 2L)
  }

  test("P2 comparison: 6-day cartesian zero-fill, Tuesday first, Mondays excluded") {
    val out = Analytics.salesByDayComparison(curated)
    val rows = out.collect()
    // months {07,08} × 6 days × observed categories
    val cats = rows.map(_.getAs[String]("order_category")).distinct
    val days = rows.map(_.getAs[String]("day_of_week")).distinct.toSet
    assert(!days.contains("Monday"))
    assert(days.size === 6)
    // 2025-07-01 is a Tuesday: r1 counted under (2025-07, Tuesday, Restaurante)
    val tue = rows.find(r => r.getAs[String]("month") == "2025-07"
      && r.getAs[String]("day_of_week") == "Tuesday"
      && r.getAs[String]("order_category") == "Restaurante").get
    assert(tue.getAs[Long]("count") === 1L)
    // zero-filled cell exists: (2025-08, Saturday, Restaurante) = 0
    val zero = rows.find(r => r.getAs[String]("month") == "2025-08"
      && r.getAs[String]("day_of_week") == "Saturday"
      && r.getAs[String]("order_category") == "Restaurante").get
    assert(zero.getAs[Long]("count") === 0L)
    // full cartesian size
    assert(rows.length === 2 * 6 * cats.length)
  }

  test("P6 mayo pct: percent within burger sums to 100") {
    val out = Analytics.mayoPctAndCounts(curated).collect()
    val smash = out.filter(_.getAs[String]("item_name") == "Smash Burger")
    assert(smash.map(_.getAs[Double]("percentage")).sum === 100.0)
    assert(smash.map(_.getAs[String]("mayo_type")).toSet === Set("Ajo", "Chipotle"))
  }

  test("P5 mayo by month: 'Sin Mayonesa' standardized to Natural") {
    val out = Analytics.mayoDistributionByMonth(curated).collect()
    val chicken = out.find(_.getAs[String]("item_name") == "Chicken Burger").get
    assert(chicken.getAs[String]("mayo_type") === "Natural")
  }

  test("P7 beverages: categories and pct-of-category") {
    val out = Analytics.beverageDistribution(curated).collect()
    val byCat = out.groupBy(_.getAs[String]("category"))
    assert(byCat.keySet === Set("Refrescos", "Malteadas", "Aguas"))
    byCat.values.foreach(rows => assert(rows.map(_.getAs[Double]("percentage")).sum === 100.0))
  }

  test("P8 beverages by month: water standardized") {
    val out = Analytics.beverageDistributionByMonth(curated).collect()
    assert(out.exists(r => r.getAs[String]("item_name") == "Agua Embotellada"
      && r.getAs[String]("category") == "Aguas"))
  }

  test("P9: 7-day domain, case-sensitive Mesa ('mesa vip' → Otro)") {
    val (total, byCat) = Analytics.salesByDayOfWeek(curated)
    val t = total.collect()
    assert(t.length === 7)
    assert(t.head.getAs[String]("day_of_week") === "Monday") // ordered, zero-filled
    assert(t.head.getAs[Long]("count") === 0L)
    val cats = byCat.collect()
    // r4 'mesa vip' is lowercase → NOT Restaurante under the case-sensitive rule
    val friCat = cats.filter(r => r.getAs[String]("day_of_week") == "Friday")
      .map(r => r.getAs[String]("order_category") -> r.getAs[Long]("count")).toMap
    assert(friCat.getOrElse("Otro", 0L) === 1L) // 2025-08-01 is a Friday
  }

  test("P12 cumulative KPIs") {
    val k = Analytics.cumulativeKpis(curated).collect().head
    assert(k.getAs[Double]("total_revenue") === 415.0)
    assert(k.getAs[Long]("total_receipts") === 5L)
    assert(k.getAs[Double]("average_receipt_value") === 83.0)
    assert(k.getAs[String]("first_sale_date") === "2025-07-01")
    assert(k.getAs[String]("last_sale_date") === "2025-08-02")
    // months: 07 → 335, 08 → 80 ⇒ avg 207.5
    assert(k.getAs[Double]("average_monthly_revenue") === 207.5)
  }

  test("P13 weekday vs weekend: Friday is Weekend") {
    val out = Analytics.weekdayVsWeekend(curated).collect()
    val m = out.map(r => r.getAs[String]("period_type") -> r.getAs[Long]("total_receipts")).toMap
    // weekend rows: r3 (Fri 07-04), r4 (Fri 08-01), r5 (Sat 08-02)
    assert(m("Weekend") === 3L)
    assert(m("Weekday") === 2L)
  }

  test("P14 heatmap: 7 rows, 24 hour columns, zero-filled") {
    val out = Analytics.hourlyTrafficHeatmap(curated)
    assert(out.columns.length === 25)
    val rows = out.collect()
    assert(rows.length === 7)
    assert(rows.head.getAs[String]("day_of_week") === "Monday")
    val tue = rows.find(_.getAs[String]("day_of_week") == "Tuesday").get
    assert(tue.getAs[Long]("12") === 1L)
    assert(tue.getAs[Long]("3") === 0L)
  }

  test("P18 monthly KPI comparison: lag-based pct change") {
    val out = Analytics.monthlyKpiComparison(curated).collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(out(0).fieldIndex("revenue_change_pct"))) // first month: no prior
    val aug = out(1)
    // 07 revenue 335, 08 revenue 80 → (80-335)/335*100
    assert(math.abs(aug.getAs[Double]("revenue_change_pct") - (-76.11940298507463)) < 1e-9)
  }

  test("V1 dedup: newest (receipt, item) wins") {
    val dup = Seq(
      ("r1", ts("2025-07-01 12:00:00"), "old", "Burger", 1.0, 1.0, null.asInstanceOf[String]),
      ("r1", ts("2025-07-02 12:00:00"), "new", "Burger", 2.0, 2.0, null.asInstanceOf[String])
    ).toDF("receipt_number", "shifted_time", "order_type", "item_name", "price", "total_money", "modifiers")
    val out = Analytics.dedupLatest(dup).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("order_type") === "new")
  }

  test("G2 combo choices: standardization + burger-only mayo pairing") {
    val combos = Seq(
      ("c1", ts("2025-07-01 12:00:00"), "Mesa", "Combo Pa Dos", 240.0, 240.0,
        "Hamburguesa 1(Hamburguesa Smash 1);Hamburguesa 2(Hamburguesa Chiken 2);Mayonesa(Ajo);Mayonesa(Chipotle);Refresco Sabor(Coca fria);Papas(Gajo)")
    ).toDF("receipt_number", "shifted_time", "order_type", "item_name", "price", "total_money", "modifiers")
    val choices = ComboChoices.comboChoiceCounts(combos).collect()
      .map(r => r.getAs[String]("choice") -> r.getAs[Long]("count")).toMap
    // papas IS a choice key here (unlike G1); coca is case-insensitive → Coca-Cola
    assert(choices === Map(
      "Smash Burger" -> 1L, "Chicken Burger" -> 1L, "Coca-Cola" -> 1L, "Gajo" -> 1L))
    val mayo = ComboChoices.comboBurgerMayoCounts(combos).collect()
      .map(r => (r.getAs[String]("burger_type"), r.getAs[String]("mayo_type"))).toSet
    assert(mayo === Set(("Smash Burger", "Ajo"), ("Chicken Burger", "Chipotle")))
  }

  test("P15 market basket: set semantics, lift filter, mlxtend columns") {
    val baskets = Seq(
      ("r1", "Burger"), ("r1", "Fries"), ("r1", "Fries"), // dup collapses
      ("r2", "Burger"), ("r2", "Fries"),
      ("r3", "Burger"), ("r4", "Fries"), ("r5", "Burger"), ("r5", "Fries")
    ).toDF("receipt_number", "item_name")
    val rules = MarketBasket.rules(baskets, minSupport = 0.1, minLift = 0.5)
    assert(rules.columns.toSeq === Seq("antecedents", "consequents", "support", "confidence", "lift"))
    val r = rules.collect().find(r =>
      r.getAs[Seq[String]]("antecedents") == Seq("Burger")).get
    // P(Fries|Burger) = 3/4; support(Burger→Fries) = 3/5
    assert(math.abs(r.getAs[Double]("confidence") - 0.75) < 1e-9)
    assert(math.abs(r.getAs[Double]("support") - 0.6) < 1e-9)
  }
}
