package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: rewrite threshold comparisons on unbounded
  * `levenshtein(a, b)` into the threshold form `levenshtein(a, b, k)`,
  * whose banded DP is O(n·k) and bails out early instead of filling the
  * full O(n·m) matrix. `lev(a,b) <= k  ⟺  lev(a,b,k) >= 0` (the bounded
  * form returns −1 past the threshold, the exact distance otherwise) —
  * a pure plan win with identical results, the transformation a SQL
  * author shouldn't have to know about. This is the library's
  * preference-order case (c): a `Rule[LogicalPlan]` where expression
  * rewriting can't be expressed by built-ins.
  */
object BoundLevenshtein extends Rule[LogicalPlan] {
  private def bounded(l: Expression, r: Expression, k: Expression): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(k)), Literal(0))
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), k @ Literal(v: Int, IntegerType)) if v >= 0 =>
      bounded(l, r, k)
    case GreaterThanOrEqual(k @ Literal(v: Int, IntegerType), Levenshtein(l, r, None)) if v >= 0 =>
      bounded(l, r, k)
    case LessThan(Levenshtein(l, r, None), Literal(v: Int, IntegerType)) if v >= 1 =>
      bounded(l, r, Literal(v - 1))
    case GreaterThan(Literal(v: Int, IntegerType), Levenshtein(l, r, None)) if v >= 1 =>
      bounded(l, r, Literal(v - 1))
  }
}

/** Session extensions wiring the library's Catalyst additions into any
  * session via config — `spark.sql.extensions=graft.plans.GraftExtensions`
  * — so SQL-only users get the native `cosine_similarity` function and
  * the bounded-levenshtein rewrite without touching the Column API.
  * For an already-running session use [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BoundLevenshtein)
    ext.injectFunction((
      FunctionIdentifier(CosineSimilarity.name),
      new ExpressionInfo(classOf[CosineSimilarity].getName, CosineSimilarity.name),
      (exprs: Seq[Expression]) => {
        // Arity-check before indexing: a 0/1-arg SQL call must surface
        // as a clean analysis error, not NoSuchElementException.
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> s"`${CosineSimilarity.name}`",
              "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        CosineSimilarity(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(graft.functions.TopKCount.name),
      new ExpressionInfo(
        classOf[graft.functions.TopKCount].getName, graft.functions.TopKCount.name),
      graft.functions.TopKCount.fromExprs _))
  }
}

object GraftExtensions {
  /** Runtime installation on an existing session (idempotent). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(BoundLevenshtein))
      spark.experimental.extraOptimizations ++= Seq(BoundLevenshtein)
    CosineSimilarity.register(spark)
  }
}
