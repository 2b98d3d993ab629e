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
  * Scale shape: the split-list id set is tiny and broadcast; the
  * seed/degeneracy/init derivation is ONE window chain over the split
  * lists' vectors — every window partitions by the list id, so they
  * share a single exchange (seed A = first vector by id, its cosine,
  * the list's min cosine for the degeneracy test, seed B = first
  * vector by (cosine, id) — all per-row columns of the same pass) —
  * and the result is checkpointed ONCE, so the Lloyd rounds, the
  * id-parity fallback and the final centroid aggregation read blocks
  * instead of re-executing the join chain per consumer (the r12–r14
  * shape recomputed it up to six times — measured ~2× the whole gate).
  * The work shuffles only the over-full lists' vectors — O(drift),
  * not O(index). Untouched lists pass through with an anti-join. The
  * new list id is `old + newListOffset` (one split per list per pass;
  * run the pass again if a list is still over-full after doubling).
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

  /** The `iters` Lloyd rounds shared by both split paths: per-(list,
    * sub) 6-dp centroids, (cosine DESC, sub ASC) argmax reassign.
    * `cur` is `(idCol, listCol, __vec, __sub)` and SHOULD be a
    * checkpointed frame — each round consumes it twice (centroid
    * aggregation + join-back).
    */
  private def lloyd(cur0: DataFrame, idCol: String, listCol: String,
                    iters: Int): DataFrame = {
    var cur = cur0
    (1 to iters).foreach { i =>
      val cents = cur
        .select(col(listCol), col("__sub"), posexplode(col("__vec")).as(Seq("__pos", "__v")))
        .groupBy(col(listCol), col("__sub"), col("__pos"))
        .agg(avg(col("__v").cast("double")).as("__c"))
        .groupBy(col(listCol), col("__sub"))
        .agg(array_sort(collect_list(struct(col("__pos"), col("__c")))).as("__pc"))
        .select(col(listCol), col("__sub"),
          transform(col("__pc"), x => round(x.getField("__c"), 6)).as("__cent"))
      val w = Window.partitionBy(col(idCol)).orderBy(col("__cos").desc, col("__sub"))
      val next = cur.select(col(idCol), col(listCol), col("__vec"))
        .join(broadcast(cents), Seq(listCol))
        .select(col(idCol), col(listCol), col("__vec"), col("__sub"),
          round(Ann.cosine(col("__vec"), col("__cent")), 6).as("__cos"))
        .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
        .select(col(idCol), col(listCol), col("__vec"), col("__sub"))
      // checkpoint all but the last round: round i+1 reads round i
      // TWICE (centroid aggregation + join-back), so an unsevered
      // chain re-executes each earlier round's join+window per read;
      // the last round flows straight to the (single-consumer) output
      cur = if (i < iters) graft.operators.Checkpoints.eager(next)._1 else next
    }
    cur
  }

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
    // ONE window chain, one exchange (every window partitions by the
    // list): positional rank + init sub, seed A = first vector by id,
    // per-list min 6-dp cosine to seed A (degeneracy test) — then ONE
    // checkpoint that the Lloyd rounds, the degenerate pass-through and
    // the centroid aggregation all read.
    val wId = Window.partitionBy(col(listCol)).orderBy(col(idCol))
    val wList = Window.partitionBy(col(listCol))
    val base = graft.operators.Checkpoints.eager(sv
      .withColumn("__r", row_number().over(wId))
      .withColumn("__va", first(col("__vec")).over(wId))
      .withColumn("__mc",
        min(round(Ann.cosine(col("__vec"), col("__va")), 6)).over(wList))
      .select(col(idCol), col(listCol), col("__vec"),
        expr("((CAST(__r AS BIGINT) - 1) * __k) DIV __n").as("__sub"),
        (col("__mc") >= 1.0).as("__degen")))._1
    val degInit = base.filter(col("__degen"))
      .select(col(idCol), col(listCol), col("__vec"), col("__sub"))
    val cur = lloyd(
      base.filter(!col("__degen"))
        .select(col(idCol), col(listCol), col("__vec"), col("__sub")),
      idCol, listCol, iters)
    val moved = cur.unionByName(degInit).select(col(idCol),
      (col(listCol) + col("__sub") * lit(newListOffset)).as(listCol))
    val newAsn = asn.join(broadcast(split.select(col(listCol))), Seq(listCol), "left_anti")
      .select(col(idCol), col(listCol))
      .unionByName(moved)
    val splitCents = Ann
      .centroids(
        moved.join(base.select(col(idCol), col("__vec").as(vecCol)), Seq(idCol)),
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
    // ONE window chain, one exchange (all three windows partition by
    // the list id): rank by id, seed A = the list's first vector,
    // __ca = 6-dp cosine to seed A, the list's min __ca (degeneracy
    // test), seed B = the list's first vector by (__ca, id) — computed
    // per row, then ONE checkpoint read by the id-parity fallback, the
    // Lloyd rounds and the final centroid aggregation alike.
    val wA = Window.partitionBy(col(listCol)).orderBy(col(idCol))
    val wList = Window.partitionBy(col(listCol))
    val base = graft.operators.Checkpoints.eager {
      val withA = sv
        .withColumn("__r", row_number().over(wA))
        .withColumn("__va", first(col("__vec")).over(wA))
        .withColumn("__ca", round(Ann.cosine(col("__vec"), col("__va")), 6))
      val wB = Window.partitionBy(col(listCol)).orderBy(col("__ca"), col(idCol))
      withA
        .withColumn("__mc", min(col("__ca")).over(wList))
        .withColumn("__vb", first(col("__vec")).over(wB))
        .select(col(idCol), col(listCol), col("__vec"), col("__r"),
          (col("__mc") >= 1.0).as("__degen"),
          when(col("__ca") >= round(Ann.cosine(col("__vec"), col("__vb")), 6), 0)
            .otherwise(1).as("__sub"))
    }._1
    // Degenerate lists: min 6-dp cosine to seed A is 1.0 ⇒ every vector
    // is (rounded-)identical to the seed, 2-means cannot make progress
    // — id-parity split instead: odd ranks stay, even ranks move.
    val degMoved = base.filter(col("__degen"))
      .select(col(idCol),
        when(pmod(col("__r"), lit(2)) === 1, col(listCol))
          .otherwise(col(listCol) + lit(newListOffset)).as(listCol))
    val cur = lloyd(
      base.filter(!col("__degen"))
        .select(col(idCol), col(listCol), col("__vec"), col("__sub")),
      idCol, listCol, iters)
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
        moved.join(base.select(col(idCol), col("__vec").as(vecCol)), Seq(idCol)),
        listCol, vecCol)
      .select(col(listCol),
        transform(col("centroid"), x => round(x, 6)).as("centroid"))
    (newAsn, splitCents)
  }
}
