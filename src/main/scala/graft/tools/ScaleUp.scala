package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-only scale-up: derive an sf1-sized dataset from the driver's
  * sf0.1 tables by unioning key-shifted copies of the FACT tables
  * (lineitem, orders, events ×copies) while keeping dimensions and the
  * text/embedding corpora as-is — the realistic shape (facts grow,
  * dims don't). Timestamps of each events copy shift by 37 h so
  * event-time density stays constant instead of stacking 10 identical
  * streams on the same instants.
  *
  * This is a measurement artifact for BENCH extrapolation only — gate
  * correctness always runs against the driver's own testdata.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts has shipped as TIMESTAMP(NANOS), timestamp[us] and
      // BIGINT nanos across testdata generations; the events copies
      // below load through Tables.events, which normalizes all three to
      // TimestampType (this also sets the nanosAsLong flag it needs).
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val keyOff = 100000000L // > any sf0.1 orderkey
    val evOff = 1000000000L

    def scaledFrom(base: org.apache.spark.sql.DataFrame, name: String)(
        shift: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Unit =
      (0 until copies).map(i => shift(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    def scaled(name: String)(shift: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Unit =
      scaledFrom(spark.read.parquet(s"$sfDir/$name.parquet"), name)(shift)
    scaled("lineitem")((df, i) => df.withColumn("l_orderkey", $"l_orderkey" + i * keyOff))
    scaled("orders")((df, i) => df.withColumn("o_orderkey", $"o_orderkey" + i * keyOff))
    // Tables.events normalizes ts to TimestampType whatever the file
    // stores, so the 37 h shift is an interval add; the copies write
    // timestamp[us], which Tables.events passes through on read.
    scaledFrom(graft.Tables.events(spark, sfDir), "events") { (df, i) =>
      df.withColumn("event_id", $"event_id" + i * evOff)
        .withColumn("ts", $"ts" + expr(s"make_interval(0, 0, 0, 0, ${37 * i}, 0, 0)"))
    }
    // Optional 4th arg "corpora": also scale documents/embeddings
    // ×copies. Each document copy i suffixes every TOKEN with "·i", so
    // copies share no shingles — the corpus becomes `copies` disjoint
    // sub-corpora and the near-dup/LSH/fuzzy structure grows exactly
    // linearly (shifted-id verbatim copies would instead make every doc
    // an exact dup of its 9 clones and blow the pair count up
    // quadratically in copies — a different, unrealistic stress).
    // Embedding copies shift vec_id and label, keeping values — bucket
    // populations stay constant, bucket count grows.
    val scaleCorpora = args.length > 3 && args(3) == "corpora"
    if (scaleCorpora) {
      val docOff = 10000000L
      scaled("documents") { (df, i) =>
        val tagged =
          if (i == 0) df.withColumn("text", col("text"))
          else df.withColumn(
            "text",
            array_join(transform(split($"text", " "), t => concat(t, lit("·" + i))), " "))
        tagged.withColumn("doc_id", $"doc_id" + i * docOff)
      }
      scaled("embeddings") { (df, i) =>
        df.withColumn("vec_id", $"vec_id" + i * docOff)
          .withColumn("label", $"label" + i * 100)
      }
      // part: same brands (so d1's brand block grows quadratically —
      // the documented baseline's failure mode), every name TOKEN
      // suffixed per copy. The tag repeats the copy number 3× so ANY
      // two copy tags differ by ≥3 edits: even a 1-word name is >
      // levenshtein threshold 2 from its clones, the RESULT pair set
      // grows exactly linearly, and d2's word blocks stay copy-local.
      // (A single-char tag left 2-word names within distance 2 of their
      // clones — quadratic clone-pair growth AND a d1/d2 divergence at
      // the pigeonhole boundary, since blocking only guarantees recall
      // for names with > threshold words.)
      scaled("part") { (df, i) =>
        val named =
          if (i == 0) df
          else df.withColumn(
            "p_name",
            array_join(
              transform(split($"p_name", " "), t => concat(t, lit("·" + i.toString * 3))), " "))
        named.withColumn("p_partkey", $"p_partkey" + i * docOff)
      }
    }
    (Seq("region", "nation", "customer", "supplier") ++
      (if (scaleCorpora) Seq.empty else Seq("part", "documents", "embeddings")))
      .foreach { name =>
        spark.read.parquet(s"$sfDir/$name.parquet")
          .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      }
    println(s"scaled $copies x facts${if (scaleCorpora) "+corpora" else ""} from $sfDir -> $outDir")
    spark.stop()
  }
}
