package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism guard for COMPUTE-AMPLIFICATION sites (optimization
  * r17; guide §2.5 input skew / §1.2 algorithm shape).
  *
  * A small parquet table arrives as ONE scan split, and Spark runs all
  * narrow work — explodes, per-window digests, per-row code searches,
  * broadcast-cross-join scoring — inside that single scan task. Every
  * site that multiplies per-row work by a large factor (k-gram md5s per
  * character, m×k codeword distances per vector, |queries| distances
  * per corpus row, pair edit-distances per block) therefore serializes
  * on one core exactly where the engine should be using all of them:
  * measured at sf0.1, x4 spent 3.3 s of its 3.5 s wall in one task, the
  * exact-GT panel 30+ s single-task inside e16.
  */
object Scans {

  /** Hash-repartition `df` to the session shuffle width IFF the
    * optimizer's size estimate fits inside one scan split (i.e. the
    * relation cannot have meaningful scan parallelism). The exchange
    * this inserts moves at most one split's worth of bytes — trivially
    * cheap next to the amplified compute it parallelizes — and at real
    * scale the estimate exceeds the split size, the test fails, and the
    * plan is untouched (no gratuitous corpus exchange; guide §2.4).
    * Size estimates, not `.rdd`, so nothing materializes early under
    * AQE. Joins inflate size estimates multiplicatively, so derived
    * frames simply never spread — conservative in exactly the safe
    * direction.
    */
  def spreadSmall(df: DataFrame, key: Column*): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val small = try {
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(conf.filesMaxPartitionBytes)
    } catch { case scala.util.control.NonFatal(_) => false }
    if (small) df.repartition(conf.numShufflePartitions, key: _*) else df
  }
}
