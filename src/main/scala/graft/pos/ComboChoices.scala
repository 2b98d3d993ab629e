package graft.pos

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** G2/P16 — combo-choice analysis (reference `cumulative_report.py:162-289`):
  * parse each combo row's modifier string into its chosen components and
  * count them per combo. The reference builds driver-side Counters; here
  * the parse is a flatMap generator and the Counter is a groupBy —
  * distributed, one shuffle.
  */
object ComboChoices {

  private val paren = "\\((.*?)\\)".r
  private val choiceKeys = Seq("hamburguesa", "refresco", "papas", "malteada")

  /** Name standardization (reference `get_standard_name`,
    * `cumulative_report.py:189-195`): note 'coca' is case-INSENSITIVE here
    * and yields hyphenated 'Coca-Cola' — deliberately different from G1's
    * case-sensitive 'Coca Cola' rule (two near-identical rule sets exist
    * in the reference; both are preserved, SURVEY §2.5 C7).
    */
  def standardName(name: String): String = {
    val l = name.toLowerCase
    if (l.contains("smash")) "Smash Burger"
    else if (l.contains("chiken") || l.contains("chicken")) "Chicken Burger"
    else if (l.contains("coca")) "Coca-Cola"
    else name
  }

  /** Parse choices per `extract_choices` (`cumulative_report.py:197-209`):
    * entries whose pre-paren key contains any choice keyword, paren
    * content trimmed + standardized. Bag semantics (duplicates kept).
    */
  def extractChoices(modifierString: String): Seq[String] =
    if (modifierString == null) Seq.empty
    else
      modifierString.split(";", -1).toSeq.flatMap { part =>
        // indexOf, not split-on-regex: this runs per modifier entry in the
        // hot path and String.split("\\(") would recompile its Pattern
        // every call.
        val parenIdx = part.indexOf('(')
        val key = (if (parenIdx >= 0) part.substring(0, parenIdx) else part).toLowerCase
        if (choiceKeys.exists(key.contains))
          paren.findFirstMatchIn(part).map(m => standardName(m.group(1).trim))
        else None
      }

  /** Burger→mayo pairing per `analyze_combo_choices_with_mayo`
    * (`cumulative_report.py:254-282`): mains are hamburguesa/refresco
    * entries; the burger list keeps only standardized names containing
    * 'burger'; the i-th mayo pairs with the i-th BURGER (unlike G1,
    * where the index runs over all mains).
    */
  def extractBurgerMayoPairs(modifierString: String): Seq[(String, String)] = {
    if (modifierString == null) return Seq.empty
    val all = modifierString.split(";", -1).toSeq
    val mains = all.filter { m =>
      val l = m.toLowerCase; l.contains("hamburguesa") || l.contains("refresco")
    }
    val mayos = all.filter(_.toLowerCase.contains("mayonesa"))
    val burgers = mains.flatMap { m =>
      paren.findFirstMatchIn(m).map(mm => standardName(mm.group(1).trim))
    }.filter(_.toLowerCase.contains("burger"))
    mayos.zipWithIndex.flatMap { case (mayo, i) =>
      if (i < burgers.length)
        paren.findFirstMatchIn(mayo).map(mm => burgers(i) -> mm.group(1).trim)
      else None
    }
  }

  private def comboRows(df: DataFrame): Dataset[(String, String)] = {
    import df.sparkSession.implicits._
    df.filter(lower(col("item_name")).contains("combo"))
      .select(col("item_name"), col("modifiers"))
      .as[(String, String)]
  }

  /** (combo, choice) → count — the distributed Counter of
    * `analyze_combo_choices`.
    */
  def comboChoiceCounts(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    comboRows(df)
      .flatMap { case (combo, mods) => extractChoices(mods).map(combo -> _) }
      .toDF("combo_name", "choice")
      .groupBy(col("combo_name"), col("choice"))
      .agg(count(lit(1)).as("count"))
  }

  /** (combo, burger, mayo) → count — the nested Counter of
    * `analyze_combo_choices_with_mayo`.
    */
  def comboBurgerMayoCounts(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    comboRows(df)
      .flatMap { case (combo, mods) =>
        extractBurgerMayoPairs(mods).map { case (b, m) => (combo, b, m) }
      }
      .toDF("combo_name", "burger_type", "mayo_type")
      .groupBy(col("combo_name"), col("burger_type"), col("mayo_type"))
      .agg(count(lit(1)).as("count"))
  }
}
