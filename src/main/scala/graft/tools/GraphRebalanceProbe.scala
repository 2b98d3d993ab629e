package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composition measurement behind the e19b ×10-corpora stress row:
  * a kNN-graph build whose list COUNT is frozen while the corpus grows
  * pays N·nprobe·(N/L) candidate work — the documented N²/L query-
  * model shape. The production fix is exactly the e20 operator: split
  * over-full lists ([[graft.similarity.Rebalance.splitLists]]) so L
  * grows with N and per-query candidate work stays at the target list
  * size. This tool measures that composition end to end at one scale:
  *   1. learned lists (sign-hash init + 2 Lloyd rounds — 8 lists);
  *   2. graph wall + recall@k at nprobe=2 over those 8 lists;
  *   3. rebalance passes until every list ≤ target size (L grows);
  *   4. graph wall + recall@k at the SAME nprobe over the split lists.
  *
  * Usage: runMain graft.tools.GraphRebalanceProbe [sfDir] [targetListSize] [panel] [k]
  * Output: one JSON line per configuration.
  */
object GraphRebalanceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/.bench/sf1c"
    val target = if (args.length > 1) args(1).toLong else 500L
    val panel = if (args.length > 2) args(2).toInt else 200
    val k = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").cache()
    val n = emb.count()

    // exact top-k of a fixed panel — the recall ground truth
    val q = emb.filter($"vec_id" < panel)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"bid")
    val exact = broadcast(q)
      .crossJoin(emb.select($"vec_id".as("bid"), $"embedding".as("bv")))
      .filter($"qid" =!= $"bid")
      .select($"qid", $"bid",
        round(graft.functions.Exprs.cosine($"qv", $"bv"), 6).as("cosine"))
      .withColumn("r", row_number().over(w)).filter($"r" <= k)
      .select($"qid", $"bid").cache()
    val nExact = exact.count()

    val signInit =
      element_at($"embedding", 1).geq(0f).cast("int") * 4 +
        element_at($"embedding", 2).geq(0f).cast("int") * 2 +
        element_at($"embedding", 3).geq(0f).cast("int")
    val learned = graft.similarity.Ann
      .kmeansIterate(emb.withColumn("ibkt", signInit), "vec_id", "embedding", "ibkt", 2)
      .select($"vec_id", $"list").localCheckpoint(true)

    def measure(tag: String, lists: org.apache.spark.sql.DataFrame): Unit = {
      val inp = emb.join(lists, Seq("vec_id")).localCheckpoint(true)
      val nLists = inp.select($"list").distinct().count()
      val maxList = inp.groupBy($"list").count().agg(max($"count")).as[Long].head()
      // warm pass (codegen/JIT) — not billed; timed pass follows
      var g = graft.similarity.Ann
        .knnGraph(inp, "vec_id", "embedding", "list", k, nprobe = 2)
        .localCheckpoint(true)
      g.count(); g.unpersist()
      val t0 = System.nanoTime()
      g = graft.similarity.Ann
        .knnGraph(inp, "vec_id", "embedding", "list", k, nprobe = 2)
        .localCheckpoint(true)
      val edges = g.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val hit = g.select($"qid", $"bid").join(exact, Seq("qid", "bid")).count()
      println(f"""{"config":"$tag","n":$n,"lists":$nLists,"max_list":$maxList,"sec":$sec%.2f,"edges":$edges,"recall_at_$k":${hit.toDouble / nExact}%.3f}""")
      inp.unpersist(); g.unpersist()
    }

    measure("frozen_8_lists", learned)

    // rebalance to the target list size (L grows with N), 2-way ladder
    val t2w = System.nanoTime()
    var cur = learned
    var offset = cur.select($"list").distinct().count()
    val nLists0 = offset
    var passes = 0
    var maxNow = Long.MaxValue
    while (maxNow > target && passes < 8) {
      cur = graft.similarity.Rebalance
        .splitLists(cur, emb, "vec_id", "embedding", "list", target, offset)
        .localCheckpoint(true)
      maxNow = cur.groupBy($"list").count().agg(max($"count")).as[Long].head()
      offset *= 2
      passes += 1
    }
    val split2wSec = (System.nanoTime() - t2w) / 1e9
    println(f"""{"config":"split_2way_ladder","passes":$passes,"split_sec":$split2wSec%.2f}""")
    measure(s"rebalanced_${passes}_passes", cur)

    // K-WAY: one pass splits each list into ceil(size/target) sub-lists
    val tkw = System.nanoTime()
    var kAsn = graft.similarity.Rebalance
      .splitListsK(learned, emb, "vec_id", "embedding", "list", target, nLists0)
      ._1.localCheckpoint(true)
    var kMax = kAsn.groupBy($"list").count().agg(max($"count")).as[Long].head()
    var kPasses = 1
    // residual 2-way pass only if Lloyd left a sub-list over target
    if (kMax > target) {
      kAsn = graft.similarity.Rebalance
        .splitLists(kAsn, emb, "vec_id", "embedding", "list", target,
          nLists0 * 16)
        .localCheckpoint(true)
      kMax = kAsn.groupBy($"list").count().agg(max($"count")).as[Long].head()
      kPasses += 1
    }
    val splitKSec = (System.nanoTime() - tkw) / 1e9
    println(f"""{"config":"split_kway","passes":$kPasses,"split_sec":$splitKSec%.2f,"max_list":$kMax}""")
    measure("rebalanced_kway", kAsn)

    // the PRODUCTION path end-to-end (`Ann.knnGraphRebalanced` at the
    // absolute target — the knob a growing corpus needs): split cost
    // INCLUDED in the wall (the two configs above time the graph alone)
    {
      val inp = emb.join(learned, Seq("vec_id")).localCheckpoint(true)
      var g = graft.similarity.Ann
        .knnGraphRebalanced(inp, "vec_id", "embedding", "list", k, nprobe = 2,
          targetListSize = target)
        .localCheckpoint(true)
      g.count(); g.unpersist()
      val t0 = System.nanoTime()
      g = graft.similarity.Ann
        .knnGraphRebalanced(inp, "vec_id", "embedding", "list", k, nprobe = 2,
          targetListSize = target)
        .localCheckpoint(true)
      val edges = g.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val hit = g.select($"qid", $"bid").join(exact, Seq("qid", "bid")).count()
      println(f"""{"config":"default_e19c_target$target","n":$n,"sec":$sec%.2f,"edges":$edges,"recall_at_$k":${hit.toDouble / nExact}%.3f}""")
      inp.unpersist(); g.unpersist()
    }
    spark.stop()
  }
}
