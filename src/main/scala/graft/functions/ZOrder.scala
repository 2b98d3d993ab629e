package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data-layout
  * key. Sorting a table by the interleaved bits of two range-queried
  * columns co-locates rows that are close in BOTH dimensions, so
  * parquet row-group min/max stats (or partition directories on a
  * z-band prefix) prune 2-D box predicates that a single-column sort
  * can only prune in one dimension. This is how lakehouse OPTIMIZE
  * ZORDER BY works; here it is a plain codegen'd integer expression
  * usable in repartitionByRange/sortWithinPartitions writes.
  *
  * The interleave is exact integer bit-shuffling, so a SQL oracle
  * replays it bit-for-bit; [[zValueSqlSpark]]/[[zValueSqlDuck]] emit
  * the identical unrolled expression in each dialect.
  */
object ZOrder {

  /** Unrolled interleave: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  private def zTerms(
      x: String,
      y: String,
      bits: Int,
      shr: (String, Int) => String,
      shl: (String, Int) => String): String =
    (0 until bits)
      .flatMap(i => Seq(
        shl(s"(${shr(x, i)} & 1)", 2 * i),
        shl(s"(${shr(y, i)} & 1)", 2 * i + 1)))
      .mkString("(", " + ", ")")

  def zValueSqlSpark(x: String, y: String, bits: Int): String =
    zTerms(x, y, bits,
      (e, i) => if (i == 0) e else s"shiftright($e, $i)",
      (e, i) => if (i == 0) e else s"shiftleft($e, $i)")

  def zValueSqlDuck(x: String, y: String, bits: Int): String =
    zTerms(x, y, bits,
      (e, i) => if (i == 0) e else s"($e >> $i)",
      (e, i) => if (i == 0) e else s"($e << $i)")

  /** Column form for layout writes: z-value of two non-negative integer
    * columns quantized to `bits` bits each.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits)
      .map(i =>
        shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
          shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1))
      .reduce(_ + _)
}
