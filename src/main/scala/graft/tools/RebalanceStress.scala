package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Drift stress for the IVF list rebalance (e20): simulate a corpus
  * whose NEW arrivals skew into a few lists (the real failure mode a
  * frozen coarse quantizer develops), then measure that
  * [[graft.similarity.Rebalance.splitLists]] (a) bounds the max list
  * size and (b) shuffles O(over-full lists), not O(index) — at 1× and
  * 10× drift volume.
  *
  * Drift model: the base corpus keeps its label lists; `driftFactor` ×
  * |corpus| synthetic arrivals (deterministic id-derived vectors) all
  * land in 2 hot lists, the worst case. One rebalance pass splits each
  * over-full list once; the tool reports max/mean list size before and
  * after and the pass's shuffle bytes.
  *
  * Usage: runMain graft.tools.RebalanceStress <sfDir> [driftFactors]
  */
object RebalanceStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 10))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val write = new AtomicLong; val read = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        write.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })

    val emb = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding", $"label".cast("long").as("list"))
    val dim = emb.select(size($"embedding")).as[Int].head()
    val n0 = emb.count()

    factors.foreach { f =>
      // deterministic drift: f*n0 arrivals, ids above the corpus, all
      // assigned to lists 0 and 1, vectors id-derived
      val drift = spark.range(n0 * f)
        .select(
          ($"id" + lit(1000000L)).as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => (pmod($"id" * 31 + i * 7, lit(97)).cast("float") - 48f) / 97f)
            .as("embedding"),
          pmod($"id", lit(2)).as("list"))
      val all = emb.unionByName(drift).localCheckpoint(true)
      val asn = all.select($"vec_id", $"list")
      val vecs = all.select($"vec_id", $"embedding")
      val sizesBefore = asn.groupBy($"list").count().as[(Long, Long)].collect().toMap
      val nLists = sizesBefore.size.toLong
      val total = sizesBefore.values.sum
      val maxSz = (21L * total) / (20L * nLists)

      // iterate passes (each splits an over-full list once — halving
      // it) until every list is under the threshold; offset climbs so
      // ids never collide
      write.set(0); read.set(0)
      val t0 = System.nanoTime()
      var cur = asn.localCheckpoint(true)
      var passes = 0
      var offset = nLists
      var maxNow = sizesBefore.values.max
      while (maxNow > maxSz && passes < 8) {
        val next = graft.similarity.Rebalance
          .splitLists(cur, vecs, "vec_id", "embedding", "list", maxSz, offset)
          .localCheckpoint(true)
        cur.unpersist()
        cur = next
        maxNow = cur.groupBy($"list").count().agg(max($"count")).as[Long].head()
        offset *= 2
        passes += 1
      }
      val sizesAfter = cur.groupBy($"list").count().as[(Long, Long)].collect().toMap
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(
        f"""{"drift_factor":$f,"n_vectors":$total,"max_sz_threshold":$maxSz,"passes":$passes,"""
          + f""""max_before":${sizesBefore.values.max},"max_after":${sizesAfter.values.max},"""
          + f""""bounded":${if (sizesAfter.values.max <= maxSz) 1 else 0},"""
          + f""""lists_before":${sizesBefore.size},"lists_after":${sizesAfter.size},"""
          + f""""sec":$sec%.2f,"shuffle_write_mb":${write.get / 1e6}%.1f,"shuffle_read_mb":${read.get / 1e6}%.1f}""")
      all.unpersist(); cur.unpersist()
    }
    spark.stop()
  }
}
