package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B measurement behind the "global ranked cut at scale" recipe
  * (PLANS.md round-13): the same CCNet tercile cut computed two ways —
  *
  *   A. [[graft.text.NgramLm.perplexityBuckets]] — two-pass
  *      `GlobalRank` NTILE (range shuffle + broadcast offsets), exact
  *      bucket sizes;
  *   B. [[graft.text.NgramLm.perplexityBucketsApprox]] —
  *      `approx_percentile` cutoffs + codegen'd when-chain, zero
  *      additional shuffle, approximate boundaries.
  *
  * Reports wall per leg (LM training + scoring shared cost included —
  * it dominates; the delta between legs is the cut itself) and the
  * bucket agreement rate between legs.
  *
  * Usage: runMain graft.tools.RankCutProbe [sfDir]
  */
object RankCutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).cache()
    val n = docs.count()

    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // warm pass (codegen/JIT) — not billed
      f.count()
      val t0 = System.nanoTime()
      val out = f.localCheckpoint(true)
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"leg":"$tag","sec":$sec%.2f,"rows":$rows,"n":$n,"sf":"$sfDir"}""")
      out
    }

    val exact = time("global_rank_ntile") {
      graft.text.NgramLm.perplexityBuckets(docs, "doc_id", "text", "source", "src0")
    }
    val approx = time("approx_percentile_cut") {
      graft.text.NgramLm.perplexityBucketsApprox(docs, "doc_id", "text", "source", "src0")
    }
    val joined = exact.select(col("doc_id"), col("ppl_bucket").as("b_exact"))
      .join(approx.select(col("doc_id"), col("ppl_bucket").as("b_approx")), "doc_id")
    val agree = joined.filter(col("b_exact") === col("b_approx")).count()
    val total = joined.count()
    println(f"""{"leg":"agreement","agree":$agree,"total":$total,"rate":${agree.toDouble / total}%.4f}""")

    // The BUDGET-PREFIX pair (round-14): exact two-pass prefix sum vs
    // histogram-threshold admission, same DSIR scoring both legs.
    // Budget = ~half the corpus tokens so both classes are live.
    val totToks = docs.select(sum(graft.functions.Exprs.tokenCount(col("text"))))
      .head().getLong(0)
    val budget = totToks / 2
    val exactSel = time("global_prefix_budget") {
      graft.text.NgramLm.importanceSelection(
        docs, "doc_id", "text", "source", "src0", budget)
    }
    val approxSel = time("histo_threshold_budget") {
      graft.text.NgramLm.importanceSelectionApprox(
        docs, "doc_id", "text", "source", "src0", budget)
    }
    val jsel = exactSel.select(col("doc_id"), col("kept").as("k_exact"), col("n_toks"))
      .join(approxSel.select(col("doc_id"), col("kept").as("k_approx"),
        col("budget_over_toks")), "doc_id")
    val sAgree = jsel.filter(col("k_exact") === col("k_approx")).count()
    val sDiffToks = jsel.filter(col("k_exact") =!= col("k_approx"))
      .agg(coalesce(sum(col("n_toks")), lit(0L))).head().getLong(0)
    val overTok = approxSel.select(col("budget_over_toks")).head().getLong(0)
    println(f"""{"leg":"budget_agreement","agree":$sAgree,"total":$total,"rate":${sAgree.toDouble / total}%.4f,"budget":$budget,"diff_toks":$sDiffToks,"declared_over_toks":$overTok}""")
    spark.stop()
  }
}
