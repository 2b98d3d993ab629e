ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pos_api_pipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Raw pass-through of the forked program's stdout: sbt's default
// LoggedOutput prefixes every line with "[info] ", which breaks any
// harness that json-parses the program's printed result line (the
// driver's bench collector has recorded parsed:null every round for
// exactly this reason — the JSON line was there, prefixed).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // t15/t17 gram-stream cache toggle (see TextQueries.spansDfWithHandle):
  // results are bit-identical either way; flip for the A/B bench.
  s"-Dspark.graft.spans.cacheGrams=${sys.env.getOrElse("SPARK_GRAFT_CACHE_GRAMS", "false")}",
  // local[32] runs 32 task threads in ONE JVM: shuffle buffers, cached
  // LSH signatures, and FP-Growth trees all share this heap. 8g is
  // GC-bound at sf0.1 (bench times for cache-heavy queries swing 3x);
  // the bench host has 128 GiB, so size the driver like the single
  // executor it actually is.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
