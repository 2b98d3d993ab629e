package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  // Parquet-backed (not a LocalRelation): ConvertToLocalRelation would
  // otherwise evaluate the whole filter at optimization time and leave
  // no levenshtein expression to inspect.
  private lazy val pairs = {
    val dir = java.nio.file.Files.createTempDirectory("levpairs").toString
    Seq(
      ("kitten", "sitten"), ("kitten", "kitten"), ("abcdef", "ghijkl"),
      ("short", "shortest")
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("BoundLevenshtein: rewrites <= and < comparisons to the bounded form; results unchanged") {
    GraftExtensions.install(spark)
    GraftExtensions.install(spark) // idempotent
    assert(spark.experimental.extraOptimizations.count(_ == BoundLevenshtein) === 1)

    def boundedCount(df: org.apache.spark.sql.DataFrame): Int = {
      var n = 0
      df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
        case Levenshtein(_, _, Some(_)) => n += 1
        case _ => ()
      }))
      n
    }
    val le = pairs.filter(expr("levenshtein(a, b) <= 1"))
    assert(boundedCount(le) > 0, "<= k not rewritten")
    assert(le.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("kitten", "sitten"), ("kitten", "kitten")))

    val lt = pairs.filter(expr("levenshtein(a, b) < 1"))
    assert(boundedCount(lt) > 0, "< k not rewritten")
    assert(lt.collect().map(_.getString(0)).toSeq === Seq("kitten"))

    val flipped = pairs.filter(expr("3 >= levenshtein(a, b)"))
    assert(boundedCount(flipped) > 0, "k >= lev not rewritten")
    assert(flipped.count() === 3) // dist 1, 0, 3 pass; 6 fails

    // A bare projection of levenshtein must NOT be rewritten (the -1
    // sentinel would corrupt values outside a comparison).
    val proj = pairs.select(expr("levenshtein(a, b)").as("d"))
    assert(boundedCount(proj) === 0)
    assert(proj.as[Int].collect().sorted === Array(0, 1, 3, 6))
  }

  test("GraftExtensions via config: SQL-only session gets cosine_similarity and the rule") {
    val old = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try {
      // Reuses the JVM's SparkContext; a fresh session picks up the
      // extensions class exactly as a spark-submit config would.
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val sim = s2.sql(
        "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS s")
        .collect().head.getDouble(0)
      assert(math.abs(sim - 1.0) < 1e-12)
      val dir = java.nio.file.Files.createTempDirectory("levpairs2").toString
      import s2.implicits._
      Seq(("kitten", "sitten")).toDF("a", "b").write.mode("overwrite").parquet(dir)
      val df = s2.read.parquet(dir)
        .filter(org.apache.spark.sql.functions.expr("levenshtein(a, b) <= 2"))
      val rewritten = df.queryExecution.optimizedPlan.toString.contains(", 2) >= 0") ||
        df.queryExecution.optimizedPlan.expressions.exists(_.exists {
          case Levenshtein(_, _, Some(_)) => true
          case _ => false
        })
      assert(rewritten, "extension rule did not fire in the new session")
      assert(df.count() === 1)
      // Wrong arity surfaces as a clean AnalysisException at analysis
      // time, not NoSuchElementException from the builder.
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT cosine_similarity(array(1.0F))").collect()
      }
      assert(ex.getMessage.contains("cosine_similarity"))
      val ex0 = intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT cosine_similarity()").collect()
      }
      assert(ex0.getMessage.contains("2"))
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      old.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
    }
  }
}
