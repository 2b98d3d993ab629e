package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared expression helpers.
  *
  * Money aggregation policy: the reference stores money as float64
  * (reference `schemas.py:11-13`) but a distributed engine cannot sum
  * doubles reproducibly (partition order changes the last bits). Every
  * "sum of money" in the public query surface therefore routes through an
  * exact decimal cast — `sum(cast(x as decimal))` — which is
  * order-independent, then casts back to double for a stable schema. The
  * source values carry at most 2 decimal digits, so the cast is lossless.
  */
object Exprs {

  /** Exact, partition-order-independent sum of a 2-decimal money column. */
  def sumMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a derived value (e.g. price * (1 - discount)): the
    * double product is deterministic per-row; the decimal(18,6) cast then
    * makes the aggregation order-independent.
    */
  def sumDerived(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Month bucket key, `yyyy-MM` (reference `strftime('%Y-%m')`,
    * pervasive month key — SURVEY §2.10).
    */
  def monthKey(ts: Column): Column = date_format(ts, "yyyy-MM")

  /** English day name (reference `dt.day_name()` — `data_preparation.py:46`). */
  def dayName(ts: Column): Column = date_format(ts, "EEEE")

  /** Hourly time-slot label `"HH:00-HH:00"` (reference `transform.py:171-197`,
    * A10): uniform left-closed one-hour bins need no bucketizer — the label
    * is a pure function of `hour(ts)`.
    */
  def timeSlot(ts: Column): Column = {
    val h = hour(ts)
    format_string("%02d:00-%02d:00", h, h + lit(1))
  }

  /** Distinct word k-shingles of a pre-split token array, joined with a
    * single space. Requires size(toks) >= k (callers filter first).
    */
  def wordShingles(toks: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), size(toks) - lit(k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))

  /** Whitespace token count for single-space-separated text: exact and
    * cheap (no array materialization) — `#spaces + 1`.
    */
  def tokenCount(text: Column): Column =
    (length(text) - length(translate(text, " ", "")) + lit(1)).cast("long")

  /** Cosine similarity between two float-vector columns, computed in
    * double precision, left-to-right — the native codegen'd expression
    * ([[CosineSimilarity]]); bit-identical to [[cosineHof]].
    */
  def cosine(a: Column, b: Column): Column =
    CosineSimilarity.column(org.apache.spark.sql.SparkSession.active, a, b)

  /** Exact squared L2 distance between two long-vector columns — the
    * native codegen'd expression ([[SqDistLong]]); bit-identical to
    * [[sqDistLongHof]] (integer arithmetic, order-free).
    */
  def sqDistLong(a: Column, b: Column): Column =
    SqDistLong.column(org.apache.spark.sql.SparkSession.active, a, b)

  /** Built-ins-only squared-L2 fold — interpreted HOFs; kept as the
    * reference implementation [[SqDistLong]] is equivalence-tested
    * against.
    */
  def sqDistLongHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** Built-ins-only variant (zip_with + aggregate fold) — interpreted
    * higher-order functions; kept as the reference implementation the
    * native expression is equivalence-tested against.
    */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (u, v) => u.cast(DoubleType) * v.cast(DoubleType)),
        lit(0.0),
        (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
