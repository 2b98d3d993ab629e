package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range joins that never fall back to BroadcastNestedLoopJoin.
  *
  * Spark plans a join with ONLY range predicates as a nested-loop
  * product — quadratic, a non-starter at scale. Both operators here
  * manufacture an equi key so the planner uses a shuffled hash /
  * sort-merge join:
  *  - `keyedWindowJoin` rides the range predicate on a natural equi key
  *    both sides share (one shuffle on that key, post-filter);
  *  - `bucketedWindowJoin` handles the key-less case by quantizing time
  *    into `windowMicros`-wide buckets and replicating each left row
  *    into the two buckets its window can touch. Join fan-out is then
  *    bounded by bucket co-occupancy, not |L|·|R|.
  */
object RangeJoin {

  /** Join right rows with `rightTimeMicros` in
    * `[leftTimeMicros, leftTimeMicros + windowMicros]`, sharing an equi
    * key. Key and time column names must differ between the two sides
    * (rename before calling) — name-based resolution sidesteps Spark's
    * ambiguous-self-join attribute problem, so both sides may derive
    * from the same source.
    */
  def keyedWindowJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTimeMicros: String,
      rightTimeMicros: String,
      windowMicros: Long,
      joinType: String = "inner"): DataFrame = {
    require(leftKey != rightKey && leftTimeMicros != rightTimeMicros,
      "rename join columns so the two sides are unambiguous")
    left.join(
      right,
      col(leftKey) === col(rightKey)
        && col(rightTimeMicros) >= col(leftTimeMicros)
        && col(rightTimeMicros) <= col(leftTimeMicros) + windowMicros,
      joinType)
  }

  /** Key-less proximity join: pairs (l, r) with `rightTimeMicros` in
    * `[leftTimeMicros, leftTimeMicros + windowMicros]`. Left rows are
    * exploded into bucket b and b+1 (a window of width w starting
    * anywhere inside bucket b ends inside b or b+1), right rows keep
    * their single bucket; the equi join on the bucket bounds the probe
    * set and the exact predicate filters after.
    */
  def bucketedWindowJoin(
      left: DataFrame,
      right: DataFrame,
      leftTimeMicros: String,
      rightTimeMicros: String,
      windowMicros: Long): DataFrame = {
    // Exact integer floor division: (t - pmod(t, w)) is divisible by w,
    // so DIV is exact for ALL long inputs — floor(t / w) on doubles
    // loses exactness past 2^53, where a 0.5-ulp error could cross a
    // bucket boundary and drop a matching pair.
    def bucket(timeCol: String): Column =
      expr(s"CAST(($timeCol - pmod($timeCol, ${windowMicros}L)) DIV ${windowMicros}L AS LONG)")
    val lb = bucket(leftTimeMicros)
    val leftB = left.withColumn("__b", explode(array(lb, lb + 1)))
    val rightB = right.withColumn("__b", bucket(rightTimeMicros))
    leftB
      .join(rightB, "__b")
      .filter(
        col(rightTimeMicros) >= col(leftTimeMicros)
          && col(rightTimeMicros) <= col(leftTimeMicros) + windowMicros)
      .drop("__b")
  }
}
