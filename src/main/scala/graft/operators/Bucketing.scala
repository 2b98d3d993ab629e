package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table plumbing: pre-shuffle a join's both sides ONCE into
  * hash buckets on the join key so every later join on that key runs
  * with NO exchange (and, with one file per bucket, no sort). This is
  * the storage-layout answer to repeated large joins — at 100 TB the
  * nightly fact⋈dim joins pay the shuffle once at write time instead
  * of per query.
  *
  * Spark specifics: `bucketBy` uses HashPartitioning's Murmur3 hash, so
  * a `repartition(buckets, key)` before the write aligns write tasks
  * with buckets — exactly one file per bucket — which lets the reader
  * report per-bucket sort order and drop both the Exchange AND the Sort
  * under a SortMergeJoin (asserted in BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table if it is not
    * already in the session catalog; returns the table name. Managed
    * tables live in the session's spark-warehouse dir.
    */
  def ensureBucketed(
      spark: SparkSession,
      name: String,
      df: => DataFrame,
      key: String,
      buckets: Int): String = {
    if (!spark.catalog.tableExists(name)) {
      // A previous JVM may have left the managed location behind while
      // this context's in-memory catalog starts empty — Spark refuses to
      // create over an existing location, so clear it first.
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.repartition(buckets, col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    }
    name
  }

  /** Stable per-dataset table-name suffix (bucketed tables for sf0.01
    * and sf0.001 coexist in one catalog). Content-aware: digests the
    * full path PLUS the dir's file listing (name, length, mtime), so a
    * dataset regenerated in place gets a fresh table instead of silently
    * reusing stale buckets, and two paths can never collide the way
    * String.hashCode could. Superseded tables linger in the warehouse
    * until the session ends — disk for correctness.
    */
  def suffix(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries =
      if (fs.exists(p))
        fs.listStatus(p)
          .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
          .sorted.mkString(",")
      else ""
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$entries".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }
}
