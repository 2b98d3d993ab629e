package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the l1 z-order layout actually buys at read time:
  * writes the same fact rows twice — z-ordered on (pk, sk) vs sorted on
  * pk alone — then, for a 2-D box predicate, counts the parquet row
  * groups whose column min/max statistics overlap the box (exactly the
  * groups a reader must scan; the rest are skipped by predicate
  * pushdown) and times the live Spark query on both layouts.
  *
  * Usage: runMain graft.tools.ZOrderBench [sfDir] [workDir]
  */
object ZOrderBench {

  /** Per-row-group (pkMin, pkMax, skMin, skMax) from the parquet footers. */
  private def rowGroupStats(dir: String): Seq[(Int, Int, Int, Int)] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.getName.endsWith(".parquet")).toSeq.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        new org.apache.hadoop.conf.Configuration())
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          val byName = block.getColumns.asScala
            .map(c => c.getPath.toDotString -> c.getStatistics).toMap
          def mm(col: String): (Int, Int) = byName(col) match {
            case s: org.apache.parquet.column.statistics.IntStatistics =>
              (s.getMin, s.getMax)
            case s => sys.error(s"unexpected stats type for $col: ${s.getClass}")
          }
          val (pkMin, pkMax) = mm("pk")
          val (skMin, skMax) = mm("sk")
          (pkMin, pkMax, skMin, skMax)
        }
      } finally reader.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/.bench/sf1"
    val work = if (args.length > 1) args(1) else "/root/repo/.bench/zorder"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val li = graft.Tables.lineitem(spark, sfDir).select(
      pmod($"l_partkey", lit(1024)).cast("int").as("pk"),
      pmod($"l_suppkey", lit(1024)).cast("int").as("sk"),
      $"l_extendedprice")
    // Identical layout mechanics for both copies: 128 range partitions
    // on the sort key, one ~47k-row row group per file — granularity
    // comes from file count, so scanned/total row groups is the direct
    // pruning measure.
    def write(df: DataFrame, sortCol: org.apache.spark.sql.Column, path: String): Unit =
      df.withColumn("__s", sortCol)
        .repartitionByRange(128, $"__s")
        .sortWithinPartitions($"__s")
        .drop("__s")
        .write.mode("overwrite")
        .parquet(path)
    write(li, graft.functions.ZOrder.zValue($"pk", $"sk", 10), s"$work/zordered")
    write(li, $"pk", s"$work/pksorted")

    // Three predicate classes, each a ~3%-of-domain box: filtered on pk
    // only (the 1-D sort's home game), on sk only (where a pk sort
    // cannot prune at all), and on both. Z-order's claim is good-enough
    // pruning on EVERY dimension, not best-in-class on one.
    val (lo, hi) = (100, 130)
    case class Box(name: String, onPk: Boolean, onSk: Boolean)
    val boxes = Seq(Box("pk-box", true, false), Box("sk-box", false, true), Box("2d-box", true, true))
    Seq("zordered", "pksorted").foreach { layout =>
      val stats = rowGroupStats(s"$work/$layout")
      boxes.foreach { b =>
        val scanned = stats.count(s =>
          (!b.onPk || (s._1 <= hi && s._2 >= lo)) && (!b.onSk || (s._3 <= hi && s._4 >= lo)))
        val pred = (if (b.onPk) Seq($"pk".between(lo, hi)) else Nil) ++
          (if (b.onSk) Seq($"sk".between(lo, hi)) else Nil)
        val t0 = System.nanoTime()
        val n = spark.read.parquet(s"$work/$layout")
          .filter(pred.reduce(_ && _))
          .agg(sum($"l_extendedprice"), count(lit(1))).collect()(0).getLong(1)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"ZORDER $layout ${b.name}: rowgroups scanned/total = $scanned/${stats.size}, " +
          f"matched rows = $n, query wall = $secs%.2f s")
      }
    }
    spark.stop()
  }
}
