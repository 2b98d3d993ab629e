package graft.pos

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** G1 — the engine's one genuine row generator: split combo line items
  * into their component items with positional sub-modifier pairing
  * (reference `data_preparation.py:116-198`,
  * `explode_combo_items_advanced`).
  *
  * Implemented as a typed `flatMap` over Rows (schema-preserving, works
  * on any frame carrying item_name/modifiers/price/cost): non-combo rows
  * pass through; a combo row is replaced by one row per parsed main item
  * (price/cost zeroed), or vanishes when nothing parses. The parse core
  * is a pure function, unit-tested against the reference's fixture.
  *
  * Scale: a flatMap is a narrow transformation — no shuffle, parallel
  * per-partition, fan-out bounded by the modifier count per row.
  */
object ComboExplode {

  final case class ComboItem(itemName: String, modifier: Option[String])

  private val paren = "\\((.*?)\\)".r

  /** Pure parse of one combo row's modifier string. Semantics mirrored
    * from the reference exactly:
    *   - "main items" are `;`-entries containing hamburguesa/refresco
    *     (case-insensitive); "sub-mods" are entries containing mayonesa.
    *   - the item name is the first `(...)` group, trimmed; entries with
    *     no parens are dropped.
    *   - naming rules: smash→Smash Burger, chiken→Chicken Burger
    *     (case-insensitive), `Coca` (case-SENSITIVE, reference
    *     `data_preparation.py:169`)→Coca Cola, else raw.
    *   - the i-th MAIN item (counting refrescos!) takes the i-th
    *     mayonesa, but only if it is a hamburguesa — the pairing index
    *     is the position in the main-item list, not a burger counter
    *     (reference `data_preparation.py:154,176-178`).
    */
  def parseCombo(modifierString: String): Seq[ComboItem] = {
    val all = modifierString.split(";", -1).toSeq
    val mains = all.filter { m =>
      val l = m.toLowerCase
      l.contains("hamburguesa") || l.contains("refresco")
    }
    val subMods = all.filter(_.toLowerCase.contains("mayonesa"))
    mains.zipWithIndex.flatMap { case (main, i) =>
      paren.findFirstMatchIn(main).map { mm =>
        val raw = mm.group(1).trim
        val lower = raw.toLowerCase
        val name =
          if (lower.contains("smash")) "Smash Burger"
          else if (lower.contains("chiken")) "Chicken Burger"
          else if (raw.contains("Coca")) "Coca Cola"
          else raw
        val assoc =
          if (main.toLowerCase.contains("hamburguesa") && i < subMods.length)
            Some(subMods(i))
          else None
        ComboItem(name, assoc)
      }
    }
  }

  def isCombo(itemName: String): Boolean =
    itemName != null && itemName.toLowerCase.contains("combo")

  /** Schema-preserving explode. Reference edge cases reproduced:
    * combo with NULL/absent modifiers → dropped (`continue` at
    * `data_preparation.py:143-145`); combo where no main parses →
    * dropped; if NO combo parses anywhere the result is exactly the
    * non-combo rows (which is what per-row drop yields — no global
    * state needed).
    */
  def explodeComboItems(df: DataFrame): DataFrame = {
    val schema = df.schema
    val iItem = schema.fieldIndex("item_name")
    val iMods = schema.fieldIndex("modifiers")
    val iPrice = schema.fieldIndex("price")
    val iCost = schema.fieldIndex("cost")
    implicit val enc = Encoders.row(schema)
    df.flatMap { r =>
      val itemName = if (r.isNullAt(iItem)) null else r.getString(iItem)
      if (!isCombo(itemName)) Iterator.single(r)
      else if (r.isNullAt(iMods)) Iterator.empty
      else {
        parseCombo(r.getString(iMods)).iterator.map { ci =>
          val vals = r.toSeq.toArray
          vals(iItem) = ci.itemName
          vals(iMods) = ci.modifier.orNull
          vals(iPrice) = 0.0
          vals(iCost) = 0.0
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }
  }
}
