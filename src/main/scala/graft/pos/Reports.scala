package graft.pos

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** K8 — Markdown report sinks (reference `monthly_report.py:514-627`,
  * `cumulative_report.py:597-703`). Every relation is computed
  * distributed and only the final small result rows are collected for
  * templating; PDF/email/PNG rendering is presentation, out of engine
  * scope (SURVEY §2.2 K9/K10).
  */
object Reports {

  private def money(x: Double): String = f"$$$x%,.2f"

  private def pctChange(cur: Double, prev: Option[Double]): String =
    prev match {
      case Some(p) if p > 0 => f"${(cur - p) / p * 100}%+.1f%%"
      case _ => "(new)" // reference `monthly_report.py:548-551`
    }

  /** Monthly two-month comparison report. Reads the lake WITH the V1
    * dedup window (S8 asymmetry: monthly deduped, cumulative raw —
    * SURVEY §7.4.6).
    */
  def monthly(spark: SparkSession, lakeRoot: String, reportMonth: String,
      comparisonMonth: String): String = {
    val deduped = Analytics.twoMonthDedupRead(
      Lake.read(spark, lakeRoot), reportMonth, comparisonMonth)
    val cleaned = Transform.cleanForReporting(deduped).cache()
    try {
      val exploded = ComboExplode.explodeComboItems(cleaned)
      val monthCol = date_format(col("shifted_time"), "yyyy-MM")

      def kpis(month: String): (Double, Long) = {
        val r = cleaned.filter(monthCol === month)
          .agg(sum(col("total_money")), countDistinct(col("receipt_number")))
          .collect().head
        (Option(r.get(0)).fold(0.0)(_.toString.toDouble), r.getLong(1))
      }
      val (curRev, curN) = kpis(reportMonth)
      val (prevRev, prevN) = kpis(comparisonMonth)

      val top = Analytics.topProducts(
        exploded.filter(monthCol === reportMonth), 5).collect()

      val sb = new StringBuilder
      sb ++= s"# Monthly Report — $reportMonth\n\n"
      sb ++= s"## KPIs (vs $comparisonMonth)\n\n"
      sb ++= "| metric | value | change |\n|---|---|---|\n"
      sb ++= s"| Revenue | ${money(curRev)} | ${pctChange(curRev, Some(prevRev).filter(_ > 0))} |\n"
      sb ++= s"| Receipts | $curN | ${pctChange(curN.toDouble, Some(prevN.toDouble).filter(_ > 0))} |\n"
      sb ++= s"| Avg receipt | ${money(if (curN > 0) curRev / curN else 0)} | |\n\n"
      sb ++= "## Top 5 products\n\n| item | sold |\n|---|---|\n"
      top.foreach { r =>
        sb ++= s"| ${r.getAs[String]("item_name")} | ${r.getAs[Long]("items_sold")} |\n"
      }
      sb.result()
    } finally cleaned.unpersist()
  }

  /** Cumulative all-history report. Reads the lake RAW — duplicates
    * included, matching the reference's S7 full scan.
    */
  def cumulative(spark: SparkSession, lakeRoot: String): String = {
    val cleaned = Transform.cleanForReporting(Lake.read(spark, lakeRoot)).cache()
    try {
      val exploded = ComboExplode.explodeComboItems(cleaned)
      val k = Analytics.cumulativeKpis(cleaned).collect().head
      val top = Analytics.topProducts(exploded, 5).collect()
      val ww = Analytics.weekdayVsWeekend(cleaned).collect()
      val rules = MarketBasket.rules(cleaned).limit(5).collect()

      val sb = new StringBuilder
      sb ++= "# Cumulative Report\n\n## KPIs\n\n| metric | value |\n|---|---|\n"
      sb ++= s"| Total Revenue | ${money(k.getAs[Double]("total_revenue"))} |\n"
      sb ++= s"| Total Unique Receipts | ${k.getAs[Long]("total_receipts")} |\n"
      sb ++= s"| Average Receipt Value | ${money(k.getAs[Double]("average_receipt_value"))} |\n"
      sb ++= s"| Average Monthly Revenue | ${money(k.getAs[Double]("average_monthly_revenue"))} |\n"
      sb ++= s"| First Sale Date | ${k.getAs[String]("first_sale_date")} |\n"
      sb ++= s"| Last Sale Date | ${k.getAs[String]("last_sale_date")} |\n\n"
      sb ++= "## Weekday vs Weekend\n\n| period | revenue | receipts | avg/receipt |\n|---|---|---|---|\n"
      ww.foreach { r =>
        sb ++= s"| ${r.getAs[String]("period_type")} | ${money(r.getAs[Double]("total_revenue"))} | " +
          s"${r.getAs[Long]("total_receipts")} | ${money(r.getAs[Double]("avg_sale_per_receipt"))} |\n"
      }
      sb ++= "\n## Top 5 products\n\n| item | sold |\n|---|---|\n"
      top.foreach { r =>
        sb ++= s"| ${r.getAs[String]("item_name")} | ${r.getAs[Long]("items_sold")} |\n"
      }
      sb ++= "\n## Top association rules\n\n| antecedents | consequents | confidence | lift |\n|---|---|---|---|\n"
      rules.foreach { r =>
        sb ++= s"| ${r.getAs[Seq[String]]("antecedents").mkString(", ")} | " +
          s"${r.getAs[Seq[String]]("consequents").mkString(", ")} | " +
          f"${r.getAs[Double]("confidence")}%.2f | ${r.getAs[Double]("lift")}%.2f |\n"
      }
      sb.result()
    } finally cleaned.unpersist()
  }
}
