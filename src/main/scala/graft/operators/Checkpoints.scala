package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame

/** Eager local checkpoints that can actually be FREED.
  *
  * `Dataset.unpersist()` after `localCheckpoint` is a no-op: the
  * checkpoint persists at the RDD level (`RDD.localCheckpoint()` calls
  * `persist(MEMORY_AND_DISK)` on the internal RDD), not through the
  * CacheManager that `Dataset.unpersist` talks to. Iterated operators
  * (suffix-array doubling rounds, rebalance split passes) that
  * checkpoint per round therefore accumulated every round's blocks
  * until GC/ContextCleaner happened to reclaim them — storage-memory
  * pressure exactly on the full-corpus stress paths.
  *
  * The fix: the shim reports the id of the internal RDD it persisted —
  * the ONE RDD the checkpoint registers — and `free()` unpersists
  * exactly that RDD. Ownership is structural (no registry diff, no
  * lock), so a concurrent caller checkpointing in parallel — the
  * Bench memo warm-up runs gates' memos concurrently — can never leak
  * its blocks into another caller's token.
  */
object Checkpoints {

  /** Handle on one checkpoint's storage; `free()` drops its blocks. */
  final class Token private[Checkpoints] (ids: Seq[Int], sc: SparkContext) {
    def free(): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }

  /** A token that frees nothing (initial-state placeholder). */
  def none(df: DataFrame): Token =
    new Token(Nil, df.sparkSession.sparkContext)

  /** Eagerly localCheckpoint `df`; returns the checkpointed frame and
    * the token that frees its blocks.
    */
  def eager(df: DataFrame, diskOnly: Boolean = false,
            keepPartitioning: Boolean = false,
            serialized: Boolean = false): (DataFrame, Token) = {
    val (ck, token, _) = eagerCounted(df, diskOnly, keepPartitioning, serialized)
    (ck, token)
  }

  /** [[eager]] plus the materialized row count — iterated callers that
    * need the count anyway (convergence tests) should not pay a second
    * action for it. `diskOnly` stores the blocks DISK_ONLY (retained
    * level tables that would otherwise thrash the storage pool).
    * `keepPartitioning` carries the executed plan's output
    * partitioning/ordering onto the checkpoint (the
    * `Dataset.localCheckpoint` behavior) — for consumers that re-read
    * the frame by the keys it is already distributed on.
    */
  def eagerCounted(df: DataFrame,
                   diskOnly: Boolean = false,
                   keepPartitioning: Boolean = false,
                   serialized: Boolean = false): (DataFrame, Token, Long) = {
    val sc = df.sparkSession.sparkContext
    // NOT Dataset.localCheckpoint: since SPARK-39748 that carries the
    // original plan's STATISTICS onto the checkpoint, and iterated
    // join-checkpoint loops (the suffix-array rounds) then compound
    // size-only join estimates into double-exponential BigInts —
    // measured ~80 s/round of pure driver `BigInteger.multiply`. The
    // shim checkpoints with fresh leaf stats (see its scaladoc).
    val (ck, rddId) = org.apache.spark.sql.GraftCheckpointShim
      .localCheckpointFreshStatsTracked(df, diskOnly, keepPartitioning, serialized)
    val n = ck.count()
    (ck, new Token(Seq(rddId), sc), n)
  }
}
