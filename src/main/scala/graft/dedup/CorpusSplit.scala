package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** LEAKAGE-SAFE corpus splitting: assign train/val/test at the
  * NEAR-DUP-COMPONENT level, not the document level. Hashing raw doc
  * ids into splits leaks whenever two near-duplicate documents land in
  * different splits — the eval set then contains paraphrases of
  * training rows and the benchmark is contaminated by construction.
  * Splitting on the connected-component id of the near-dup graph makes
  * cross-split leakage structurally impossible: a document and all its
  * near-duplicates share a component, and the component hashes to
  * exactly one split.
  *
  * Scale shape: the candidate graph is the banded-LSH pipeline (never
  * all-pairs), components contract in O(log n) rounds
  * ([[Components.connectedComponents]]), and the split assignment is a
  * narrow md5-bucket map on the component id — the same deterministic
  * selector as [[graft.operators.Sampling]], so re-runs and other
  * engines reproduce the identical split.
  */
object CorpusSplit {

  /** Per-doc split assignment from a (doc, component) frame: md5-bucket
    * the COMPONENT id — train gets buckets [0, trainPct), val the next
    * valPct, test the rest.
    */
  def assignByComponent(
      components: DataFrame,
      componentCol: String,
      salt: String,
      trainPct: Int,
      valPct: Int): DataFrame = {
    require(trainPct + valPct < 100, "train + val must leave room for test")
    val b = Sampling.bucket(col(componentCol), salt)
    components.withColumn(
      "split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
