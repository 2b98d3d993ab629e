package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.similarity.{Ann, Rebalance}

/** A/B attribution probe for the round-15 rebalance rework (the
  * RankCutProbe pattern): runs the e20 split (2-way, servable) and the
  * e20c split (k-way) over the embeddings table under BOTH shapes —
  * the r12–r14 reference (seed/degeneracy/init via separate
  * aggregate + broadcast-join chains over an UNCACHED relation, so
  * every consumer re-executes the upstream joins; verbatim below) and
  * the current `similarity/Rebalance` (one window chain, one
  * checkpoint) — counting completed stages and shuffle bytes per run.
  * The outputs are asserted row-identical, so the wall/stage delta is
  * attributable to plan shape alone.
  *
  * Usage: runMain graft.tools.RebalanceAB [sfDir] [reps]
  */
object RebalanceAB {

  /** The r12–r14 `splitListsServable`, verbatim (git f314e9f) — the
    * "before" arm. Kept here as the measured reference shape.
    */
  private def splitServableOld(
      assignments: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, listCol: String, maxListSize: Long,
      newListOffset: Long, iters: Int = 2): DataFrame = {
    val asn = assignments.select(col(idCol), col(listCol).cast("long").as(listCol))
    val split = asn.groupBy(col(listCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxListSize).select(col(listCol))
    val sv = asn.join(broadcast(split), Seq(listCol))
      .join(vectors.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), col(listCol), col(vecCol).as("__vec"))
    val wA = Window.partitionBy(col(listCol)).orderBy(col(idCol))
    val seedA = sv.withColumn("__r", row_number().over(wA)).filter(col("__r") === 1)
      .select(col(listCol), col("__vec").as("__va"))
    val withA = sv.join(broadcast(seedA), Seq(listCol))
      .withColumn("__ca", round(Ann.cosine(col("__vec"), col("__va")), 6))
    val degen = withA.groupBy(col(listCol)).agg(min(col("__ca")).as("__mc"))
      .filter(col("__mc") >= 1.0).select(col(listCol))
    val degMoved = withA.join(broadcast(degen), Seq(listCol))
      .withColumn("__r", row_number().over(wA))
      .select(col(idCol),
        when(pmod(col("__r"), lit(2)) === 1, col(listCol))
          .otherwise(col(listCol) + lit(newListOffset)).as(listCol))
    val normal = withA.join(broadcast(degen), Seq(listCol), "left_anti")
    val wB = Window.partitionBy(col(listCol)).orderBy(col("__ca"), col(idCol))
    val seedB = normal.withColumn("__r", row_number().over(wB)).filter(col("__r") === 1)
      .select(col(listCol), col("__vec").as("__vb"))
    var cur = normal.join(broadcast(seedB), Seq(listCol))
      .select(col(idCol), col(listCol), col("__vec"),
        when(col("__ca") >= round(Ann.cosine(col("__vec"), col("__vb")), 6), 0)
          .otherwise(1).as("__sub"))
    (1 to iters).foreach { _ =>
      val cents = cur
        .select(col(listCol), col("__sub"), posexplode(col("__vec")).as(Seq("__pos", "__v")))
        .groupBy(col(listCol), col("__sub"), col("__pos"))
        .agg(avg(col("__v").cast("double")).as("__c"))
        .groupBy(col(listCol), col("__sub"))
        .agg(array_sort(collect_list(struct(col("__pos"), col("__c")))).as("__pc"))
        .select(col(listCol), col("__sub"),
          transform(col("__pc"), x => round(x.getField("__c"), 6)).as("__cent"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("__cos").desc, col("__sub"))
      cur = cur.select(col(idCol), col(listCol), col("__vec"))
        .join(broadcast(cents), Seq(listCol))
        .select(col(idCol), col(listCol), col("__vec"), col("__sub"),
          round(Ann.cosine(col("__vec"), col("__cent")), 6).as("__cos"))
        .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
        .select(col(idCol), col(listCol), col("__vec"), col("__sub"))
    }
    val moved = cur.select(col(idCol),
      when(col("__sub") === 0, col(listCol))
        .otherwise(col(listCol) + lit(newListOffset)).as(listCol))
      .unionByName(degMoved)
    asn.join(broadcast(split), Seq(listCol), "left_anti")
      .select(col(idCol), col(listCol))
      .unionByName(moved)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = new AtomicInteger
    val shuffle = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shuffle.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })

    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).cache()
    e.count()
    val asn = e.select(col("vec_id"), col("label").cast("long").as("list"))
    val Array(nTotal, nLists) = asn
      .agg(count(lit(1)), countDistinct(col("list"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val maxSz = (21L * nTotal) / (20L * nLists)

    def timed(tag: String)(f: => Seq[(Long, Long)]): Seq[(Long, Long)] = {
      var out: Seq[(Long, Long)] = Nil
      (1 to reps).foreach { r =>
        stages.set(0); shuffle.set(0)
        val t0 = System.nanoTime()
        out = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"$tag","rep":$r,"sec":$sec%.2f,"stages":${stages.get},"shuffle_write_mb":${shuffle.get / 1e6}%.1f,"rows":${out.size}}""")
      }
      out
    }

    val oldServ = timed("e20_shape_old") {
      splitServableOld(asn, e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", "list", maxSz, nLists)
        .orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    val newServ = timed("e20_shape_new") {
      Rebalance.splitLists(asn, e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", "list", maxSz, nLists)
        .orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    require(oldServ == newServ, "2-way split outputs diverged")
    println(s"""{"check":"e20_outputs_identical","rows":${newServ.size}}""")
    spark.stop()
  }
}
