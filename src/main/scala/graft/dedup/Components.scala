package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair edge list — the step that
  * turns pairwise near-dup evidence (MinHash-LSH / SimHash pairs) into
  * dedup CLUSTERS, so a corpus keeps one canonical document per
  * component (component id = min doc id).
  *
  * Algorithm: iterative min-label propagation. Each round every vertex
  * takes the min label among itself and its neighbors; convergence in
  * `diameter(component)` rounds. Near-dup components are overwhelmingly
  * tiny and shallow (pairs→triangles→small cliques), so 2–4 rounds
  * finish real corpora; `maxIter` bounds pathological chains. Each
  * round is one shuffle (join + groupBy on the edge key); lineage is
  * truncated per round with an eager localCheckpoint, so plans stay
  * flat at any iteration count. For graphs with genuinely deep
  * components at 100 TB, swap the propagation loop for the
  * large-star/small-star contraction (O(log n) rounds) — same driver
  * loop, different round body.
  */
object Components {

  /** Label every vertex with the minimum vertex id reachable from it.
    *
    * @param vertices one row per vertex (singletons allowed — they keep
    *                 their own id as component)
    * @param pairs    undirected edges (each pair listed once)
    */
  def connectedComponents(
      vertices: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true) // reused every round; sever source lineage
    var labels = vertices.select(col(idCol).as("v"), col(idCol).cast("long").as("label"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("v"))
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      val stepped = labels.join(neighborMin, labels("v") === neighborMin("src"), "left")
        .select(
          labels("v"),
          labels("label").as("old"),
          least(labels("label"), coalesce(col("nmin"), labels("label"))).as("label"))
        .localCheckpoint(true)
      changed = stepped.filter(col("label") =!= col("old")).count()
      labels = stepped.select(col("v"), col("label"))
      iter += 1
    }
    labels.select(col("v").as(idCol), col("label").as("component"))
  }
}
