package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF list REBALANCE — the index-maintenance step the lifecycle
  * (`AnnIndexStream`: append, tombstone-delete, list-local compaction)
  * was missing: a drifting corpus skews list populations, and an
  * over-full list degrades every probe that touches it (per-query cost
  * is probed-list size). This splits each over-full list with a LOCAL
  * deterministic 2-means and reassigns ONLY the split lists' vectors —
  * the K5 compaction contract applied to the index itself.
  *
  * Determinism (the property that makes the split oracle-able and
  * cluster-layout-independent):
  *   - seed A = the list's minimum vector id;
  *   - seed B = the vector farthest from A (lowest 6-dp-rounded
  *     cosine, id tiebreak);
  *   - init: each vector joins the closer seed (tie → A);
  *   - then `iters` Lloyd rounds over 6-dp-rounded sub-centroids with
  *     (cosine DESC, sub ASC) argmax — the `kmeansIterate` discipline
  *     scoped to the split lists.
  *   - DEGENERATE lists (every vector 6-dp-cosine-identical to seed A,
  *     so no second seed exists and 2-means cannot separate anything)
  *     fall back to an id-parity split: rows ranked by id, odd ranks
  *     stay, even ranks move. This guarantees every pass halves an
  *     over-full list, so the documented "run the pass again while
  *     still over-full" loop always converges — without the fallback a
  *     list of identical vectors would land entirely in sub-cluster 0
  *     forever. Spec-pinned (`RebalanceSpec` identical-vector case).
  *
  * Scale shape: the split-list id set is tiny and broadcast; every
  * join in the seed/iterate chain is keyed on the list id, so the work
  * shuffles only the over-full lists' vectors — O(drift), not O(index).
  * Untouched lists pass through with an anti-join. The new list id is
  * `old + newListOffset` (one split per list per pass; run the pass
  * again if a list is still over-full after doubling).
  */
object Rebalance {

  /** Rebalanced assignment `(idCol, listCol)` over the full input:
    * vectors of lists larger than `maxListSize` are 2-means-split,
    * sub-cluster 0 keeps the list id, sub-cluster 1 moves to
    * `list + newListOffset`; all other rows pass through unchanged.
    *
    * Assignment-only form of [[splitListsServable]] — callers that
    * also need to PROBE the rebalanced index (route queries by list
    * centroid) must use the servable form, which returns the split
    * lists' final centroids alongside.
    */
  def splitLists(
      assignments: DataFrame,
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      listCol: String,
      maxListSize: Long,
      newListOffset: Long,
      iters: Int = 2): DataFrame =
    splitListsServable(
      assignments, vectors, idCol, vecCol, listCol, maxListSize,
      newListOffset, iters)._1

  /** K-WAY split — one pass where the 2-means ladder needs
    * log₂(size/target): each list over `maxListSize` splits directly
    * into ⌈size/target⌉ sub-lists. This is the UNIFORM-GROWTH remedy
    * the ×10 stress measured the need for: when every list is over
    * target (corpus grew, list count frozen), the 2-way ladder reworks
    * the whole corpus per pass (~3 full passes at ×10); one k-way pass
    * does the same job in a third of the split wall. Under sparse
    * drift (a few hot lists) [[splitListsServable]]'s 2-way pass stays
    * the cheaper default — it shuffles O(drift) and its seeds respect
    * geometry better at k=2.
    *
    * Determinism: per-list init is positional — vectors ranked by id,
    * sub = ⌊(rank−1)·k / size⌋ (balanced contiguous id runs; exactly
    * mirrorable in SQL, no seed chain) — then `iters` Lloyd rounds
    * over 6-dp sub-centroids with (cosine DESC, sub ASC) argmax, the
    * same discipline as the 2-way path. Sub-cluster 0 keeps the list
    * id; sub-cluster j moves to `list + j·newListOffset` (unique for
    * list < newListOffset). Lloyd may leave a sub-list above target
    * (it balances geometry, not counts) — callers bounding worst-case
    * list size run one residual pass, same as the 2-way contract.
    * DEGENERATE lists (every vector 6-dp-cosine-identical to the
    * list's first-by-id vector) skip the Lloyd rounds and keep the
    * balanced positional init: the (cosine DESC, sub ASC) argmax ties
    * every identical row back to sub 0, which would undo the init and
    * leave the list unsplit forever — the same non-progress the 2-way
    * path's id-parity fallback closes. Returns
    * `(assignments, splitListCentroids)` like the servable form.
    */
  def splitListsK(
      assignments: DataFrame,
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      listCol: String,
      maxListSize: Long,
      newListOffset: Long,
      iters: Int = 2): (DataFrame, DataFrame) = {
    val asn = assignments.select(col(idCol), col(listCol).cast("long").as(listCol))
    val split = asn.groupBy(col(listCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxListSize)
      .select(col(listCol), col("__n"),
        expr(s"(__n + ${maxListSize - 1}) DIV $maxListSize").as("__k"))
    val sv = asn.join(broadcast(split), Seq(listCol))
      .join(vectors.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), col(listCol), col("__n"), col("__k"), col(vecCol).as("__vec"))
    val wId = Window.partitionBy(col(listCol)).orderBy(col(idCol))
    val init = sv
      .withColumn("__r", row_number().over(wId))
      .select(col(idCol), col(listCol), col("__vec"),
        expr("((CAST(__r AS BIGINT) - 1) * __k) DIV __n").as("__sub"))
    // Degenerate lists (min 6-dp cosine to the first-by-id vector is
    // 1.0 ⇒ all vectors rounded-identical): Lloyd's tie-break would
    // collapse every row to sub 0 — keep the balanced positional init.
    val seedA = sv.withColumn("__r", row_number().over(wId)).filter(col("__r") === 1)
      .select(col(listCol), col("__vec").as("__va"))
    val degen = sv.join(broadcast(seedA), Seq(listCol))
      .groupBy(col(listCol))
      .agg(min(round(Ann.cosine(col("__vec"), col("__va")), 6)).as("__mc"))
      .filter(col("__mc") >= 1.0).select(col(listCol))
    val degInit = init.join(broadcast(degen), Seq(listCol))
      .select(col(idCol), col(listCol), col("__vec"), col("__sub"))
    var cur = init.join(broadcast(degen), Seq(listCol), "left_anti")
      .select(col(idCol), col(listCol), col("__vec"), col("__sub"))
    (1 to iters).foreach { _ =>
      val cents = cur
        .select(col(listCol), col("__sub"), posexplode(col("__vec")).as(Seq("__pos", "__v")))
        .groupBy(col(listCol), col("__sub"), col("__pos"))
        .agg(avg(col("__v").cast("double")).as("__c"))
        .groupBy(col(listCol), col("__sub"))
        .agg(array_sort(collect_list(struct(col("__pos"), col("__c")))).as("__pc"))
        .select(col(listCol), col("__sub"),
          transform(col("__pc"), x => round(x.getField("__c"), 6)).as("__cent"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("__cos").desc, col("__sub"))
      cur = cur.select(col(idCol), col(listCol), col("__vec"))
        .join(broadcast(cents), Seq(listCol))
        .select(col(idCol), col(listCol), col("__vec"), col("__sub"),
          round(Ann.cosine(col("__vec"), col("__cent")), 6).as("__cos"))
        .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
        .select(col(idCol), col(listCol), col("__vec"), col("__sub"))
    }
    val moved = cur.unionByName(degInit).select(col(idCol),
      (col(listCol) + col("__sub") * lit(newListOffset)).as(listCol))
    val newAsn = asn.join(broadcast(split.select(col(listCol))), Seq(listCol), "left_anti")
      .select(col(idCol), col(listCol))
      .unionByName(moved)
    val splitCents = Ann
      .centroids(
        moved.join(sv.select(col(idCol), col("__vec").as(vecCol)), Seq(idCol)),
        listCol, vecCol)
      .select(col(listCol),
        transform(col("centroid"), x => round(x, 6)).as("centroid"))
    (newAsn, splitCents)
  }

  /** Rebalance AND keep the index servable: returns
    * `(newAssignments, splitListCentroids)` where the second frame
    * holds `(listCol, centroid)` for every list id the split touched —
    * both the kept old ids and the `old + newListOffset` ids — with
    * centroids recomputed from the FINAL assignment (6-dp rounded, the
    * same discipline as `Ann.kmeansIterate`). Untouched lists keep
    * their existing centroids, so a router refresh is
    * `old.join(splitCents, anti) ∪ splitCents` — O(drift) work.
    *
    * Without the centroid half a rebalanced index cannot be probed:
    * `Ann.ivfTopK` / `Pq.ivfAdcTopKPacked` route queries by list
    * centroid and the new `list + offset` ids would have none.
    */
  def splitListsServable(
      assignments: DataFrame,
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      listCol: String,
      maxListSize: Long,
      newListOffset: Long,
      iters: Int = 2): (DataFrame, DataFrame) = {
    val asn = assignments.select(col(idCol), col(listCol).cast("long").as(listCol))
    val split = asn.groupBy(col(listCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxListSize).select(col(listCol))
    val sv = asn.join(broadcast(split), Seq(listCol))
      .join(vectors.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), col(listCol), col(vecCol).as("__vec"))
    val wA = Window.partitionBy(col(listCol)).orderBy(col(idCol))
    val seedA = sv.withColumn("__r", row_number().over(wA)).filter(col("__r") === 1)
      .select(col(listCol), col("__vec").as("__va"))
    val withA = sv.join(broadcast(seedA), Seq(listCol))
      .withColumn("__ca", round(Ann.cosine(col("__vec"), col("__va")), 6))
    // Degenerate lists: min 6-dp cosine to seed A is 1.0 ⇒ every vector
    // is (rounded-)identical to the seed, 2-means cannot make progress.
    val degen = withA.groupBy(col(listCol)).agg(min(col("__ca")).as("__mc"))
      .filter(col("__mc") >= 1.0).select(col(listCol))
    val degMoved = withA.join(broadcast(degen), Seq(listCol))
      .withColumn("__r", row_number().over(wA))
      .select(col(idCol),
        when(pmod(col("__r"), lit(2)) === 1, col(listCol))
          .otherwise(col(listCol) + lit(newListOffset)).as(listCol))
    val normal = withA.join(broadcast(degen), Seq(listCol), "left_anti")
    val wB = Window.partitionBy(col(listCol)).orderBy(col("__ca"), col(idCol))
    val seedB = normal.withColumn("__r", row_number().over(wB)).filter(col("__r") === 1)
      .select(col(listCol), col("__vec").as("__vb"))
    var cur = normal.join(broadcast(seedB), Seq(listCol))
      .select(col(idCol), col(listCol), col("__vec"),
        when(col("__ca") >= round(Ann.cosine(col("__vec"), col("__vb")), 6), 0)
          .otherwise(1).as("__sub"))
    (1 to iters).foreach { _ =>
      val cents = cur
        .select(col(listCol), col("__sub"), posexplode(col("__vec")).as(Seq("__pos", "__v")))
        .groupBy(col(listCol), col("__sub"), col("__pos"))
        .agg(avg(col("__v").cast("double")).as("__c"))
        .groupBy(col(listCol), col("__sub"))
        .agg(array_sort(collect_list(struct(col("__pos"), col("__c")))).as("__pc"))
        .select(col(listCol), col("__sub"),
          transform(col("__pc"), x => round(x.getField("__c"), 6)).as("__cent"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("__cos").desc, col("__sub"))
      cur = cur.select(col(idCol), col(listCol), col("__vec"))
        .join(broadcast(cents), Seq(listCol))
        .select(col(idCol), col(listCol), col("__vec"), col("__sub"),
          round(Ann.cosine(col("__vec"), col("__cent")), 6).as("__cos"))
        .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
        .select(col(idCol), col(listCol), col("__vec"), col("__sub"))
    }
    val moved = cur.select(col(idCol),
      when(col("__sub") === 0, col(listCol))
        .otherwise(col(listCol) + lit(newListOffset)).as(listCol))
      .unionByName(degMoved)
    val newAsn = asn.join(broadcast(split), Seq(listCol), "left_anti")
      .select(col(idCol), col(listCol))
      .unionByName(moved)
    // Final centroids of every list id the split touched, from the
    // FINAL assignment (the last Lloyd round reassigns after its
    // centroid compute, so the discarded in-loop __cent would be one
    // round stale). One aggregation over the split lists' vectors only.
    val splitCents = Ann
      .centroids(
        moved.join(sv.select(col(idCol), col("__vec").as(vecCol)), Seq(idCol)),
        listCol, vecCol)
      .select(col(listCol),
        transform(col("centroid"), x => round(x, 6)).as("centroid"))
    (newAsn, splitCents)
  }
}
