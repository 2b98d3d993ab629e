package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Native Catalyst TYPED AGGREGATE: exact top-k values by count within
  * a group, in ONE aggregation pass — `top_k_count(value, k)` returns
  * `ARRAY<STRUCT<value: STRING, cnt: BIGINT>>` ordered by
  * (count desc, value asc).
  *
  * The built-in way to express this is groupBy(g, v).count() followed
  * by a ROW_NUMBER window over g — two aggregation stages. This is ONE
  * `ObjectHashAggregate` pass: partial hash-count maps built map-side,
  * merged reduce-side, top-k cut at eval. The exact-count contract
  * means buffers hold the full per-group value domain — right when the
  * domain is bounded (brands, categories, languages); for unbounded
  * domains use the sketch-based `freqItems`/`r7` path instead.
  *
  * WHEN TO USE — measured, not assumed (`tools/TopKBench`): in BATCH
  * the two-stage form is mildly FASTER (0.7–0.9× here at sf1–sf10)
  * because the first codegen'd HashAggregate outruns this interpreted
  * update loop and the second shuffle only carries distinct (g, v)
  * rows. Use `top_k_count` where the window idiom cannot go at all:
  *  - STREAMING aggregations — Structured Streaming rejects an
  *    aggregation chained on an aggregation (count → rank), but a
  *    single aggregate call is a plain stateful streaming agg
  *    (spec-covered: per-event-time-window top-k);
  *  - alongside other aggregates in ONE groupBy (no second plan);
  *  - rollup/cube/pivot cells, where a post-window is unwieldy.
  *
  * Preference-order case (b) from the build brief: a whole-aggregation
  * semantics packaged as a `TypedImperativeAggregate` and injected into
  * SQL via [[graft.plans.GraftExtensions]].
  */
case class TopKCount(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"top_k_count: k must be >= 1, got $k")

  override def prettyName: String = "top_k_count"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("cnt", LongType))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        // first sighting: copy — Spark reuses the row's backing buffer
        case None => buf.update(key.copy(), 1L)
      }
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // (count desc, value asc) with the value tiebreak in binary UTF-8
    // order — deterministic and engine-portable for the hash oracle
    val top = buf.toSeq
      .sortWith { case ((v1, c1), (v2, c2)) => c1 > c2 || (c1 == c2 && v1.compareTo(v2) < 0) }
      .take(k)
    new GenericArrayData(top.map { case (v, c) =>
      new GenericInternalRow(Array[Any](v, c))
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      buf.update(UTF8String.fromBytes(bytes), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKCount =
    copy(child = newChild)
}

object TopKCount {

  val name = "top_k_count"

  /** Builder for SQL registration: `top_k_count(value, k)` with k a
    * foldable integer literal.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprs match {
      case Seq(value, Literal(kv: Int, IntegerType)) => TopKCount(value, kv)
      case Seq(value, Literal(kv: Long, LongType)) => TopKCount(value, kv.toInt)
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> "2 (value, integer-literal k)",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, fromExprs, "built-in")

  /** Column-level entry point; requires [[register]] on the session. */
  def column(spark: org.apache.spark.sql.SparkSession, value: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      name, value, org.apache.spark.sql.functions.lit(k))
  }
}
