package graft.pos

import graft.SparkSpec

/** G1 contract — fixture B from FIXTURES.md §4 (the reference's
  * `sample_combo_data` / `test_explode_combo_items_advanced`,
  * `tests/reporting/test_reporting.py:24-38,66-101`).
  */
class ComboExplodeSpec extends SparkSpec {
  import ComboExplode._

  val comboMods =
    "Hamburguesa 1(Hamburguesa Smash 1);Hamburguesa 2(Hamburguesa Chiken 2);" +
      "Mayonesa(Ajo);Mayonesa(Chipotle);Refresco Sabor(Agua Natural)"

  test("parseCombo: positional mayo pairing, naming rules, drink unmodified") {
    val parsed = parseCombo(comboMods)
    assert(parsed === Seq(
      ComboItem("Smash Burger", Some("Mayonesa(Ajo)")),
      ComboItem("Chicken Burger", Some("Mayonesa(Chipotle)")),
      ComboItem("Agua Natural", None)))
  }

  test("parseCombo: pairing index counts refrescos too (not a burger counter)") {
    // Refresco first: the burger is main #2 (i=1) and takes the SECOND mayo.
    val parsed = parseCombo(
      "Refresco(Coca-Cola);Hamburguesa(Hamburguesa Smash);Mayonesa(Ajo);Mayonesa(Chipotle)")
    assert(parsed === Seq(
      ComboItem("Coca Cola", None),
      ComboItem("Smash Burger", Some("Mayonesa(Chipotle)"))))
  }

  test("parseCombo: Coca rule is case-sensitive; unparsable mains dropped") {
    assert(parseCombo("Refresco(coca fria)") === Seq(ComboItem("coca fria", None)))
    assert(parseCombo("Refresco(Coca fria)") === Seq(ComboItem("Coca Cola", None)))
    assert(parseCombo("Hamburguesa sin parens;Mayonesa(Ajo)") === Seq.empty)
  }

  test("explodeComboItems: fixture B end-to-end — 5 rows, combo gone, prices zeroed") {
    import spark.implicits._
    val df = Seq(
      ("1-1696", "Combo Pa Dos", 240.0, 129.0, comboMods),
      ("1-1696", "Malteada Chocolate", 60.0, 19.0, "Tipo de Leche(Leche Entera)"),
      ("1-1695", "Doble Chicken", 115.0, 54.0, "Mayonesa(Ajo)")
    ).toDF("receipt_number", "item_name", "price", "cost", "modifiers")

    val out = explodeComboItems(df).collect()
    assert(out.length === 5)
    val names = out.map(_.getAs[String]("item_name")).toSet
    assert(!names.exists(_.toLowerCase.contains("combo")))
    val byName = out.map(r => r.getAs[String]("item_name") -> r).toMap
    assert(byName("Smash Burger").getAs[String]("modifiers") === "Mayonesa(Ajo)")
    assert(byName("Chicken Burger").getAs[String]("modifiers") === "Mayonesa(Chipotle)")
    assert(byName("Agua Natural").getAs[String]("modifiers") === null)
    Seq("Smash Burger", "Chicken Burger", "Agua Natural").foreach { n =>
      assert(byName(n).getAs[Double]("price") === 0.0)
      assert(byName(n).getAs[Double]("cost") === 0.0)
    }
    // Pass-through rows untouched
    assert(byName("Malteada Chocolate").getAs[Double]("price") === 60.0)
    assert(byName("Doble Chicken").getAs[String]("modifiers") === "Mayonesa(Ajo)")
  }

  test("explodeComboItems: combo with null modifiers vanishes; all-unparsable leaves only non-combos") {
    import spark.implicits._
    val df = Seq(
      ("r1", "Combo X", 10.0, 5.0, null.asInstanceOf[String]),
      ("r2", "Combo Y", 10.0, 5.0, "Papas(Grandes)"), // no mains → vanishes
      ("r3", "Refresco", 25.0, 10.0, null.asInstanceOf[String])
    ).toDF("receipt_number", "item_name", "price", "cost", "modifiers")
    val out = explodeComboItems(df).collect()
    assert(out.map(_.getAs[String]("receipt_number")).toSeq === Seq("r3"))
  }
}
