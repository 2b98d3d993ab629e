package graft.tools

import graft.dedup.FuzzyLinkage
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head for the fuzzy-linkage blocking strategies on a SCALED
  * part table (the derived-sf1 bench keeps dims fixed, so this tool
  * scales part itself: ×copies with shifted keys — name distribution,
  * and therefore block-size distribution, is preserved).
  *
  * d1's brand block is quadratic in block size: ×10 parts ⇒ ×100
  * candidate pairs per brand. The word-position pigeonhole block's
  * largest cell is bounded by (brand × position × color-word)
  * frequency, so its candidates grow ×100 too but spread over 460×
  * more, smaller cells — bounding both the shuffle fan-out of any one
  * task and the levenshtein count per task. Prints both pair counts
  * and wall times.
  */
object FuzzyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/part.parquet")
      .select($"p_partkey", $"p_brand", $"p_name")
    val part = (0 until copies)
      .map(i => base.withColumn("p_partkey", $"p_partkey" + i * 10000000L))
      .reduce(_ unionByName _).cache()
    val n = part.count()

    def brandBlocked(): (Long, Long) = {
      val a = part.select($"p_partkey".as("key_a"), $"p_brand", $"p_name".as("name_a"))
      val b = part.select($"p_partkey".as("key_b"), $"p_brand", $"p_name".as("name_b"))
      val joined = a.join(b, "p_brand").filter($"key_a" < $"key_b")
        .filter(abs(length($"name_a") - length($"name_b")) <= 2)
      val pairs = joined.count()
      val hits = joined
        .withColumn("dist", levenshtein($"name_a", $"name_b", 2))
        .filter($"dist" >= 0 && $"dist" <= 2).count()
      (pairs, hits)
    }
    def wordBlocked(): Long =
      FuzzyLinkage.wordBlockedPairs(part, "p_partkey", "p_brand", "p_name", 2).count()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm pass then timed pass
    wordBlocked(); val (wHits, wSec) = time(wordBlocked())
    brandBlocked(); val ((bPairs, bHits), bSec) = time(brandBlocked())
    println(s"""{"bench":"fuzzy","parts":$n,"brand_sec":$bSec,"brand_levcandidates":$bPairs,"word_sec":$wSec,"hits_brand":$bHits,"hits_word":$wHits}""")
    spark.stop()
  }
}
