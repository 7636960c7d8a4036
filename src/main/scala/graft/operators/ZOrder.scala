package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 2-D Morton (z-order) interleave — the multi-dimensional data-layout
  * key behind Delta/Iceberg `OPTIMIZE ZORDER BY`: sorting a table by the
  * interleaved bits of two columns clusters BOTH dimensions at once, so
  * per-file min/max statistics stay narrow on each and a filter on either
  * column prunes files. A single-column sort gives perfect pruning on one
  * dimension and none on the other; z-order trades a little of each for a
  * lot of both (asserted quantitatively in ZOrderSpec).
  *
  * Pure 64-bit integer arithmetic (shifts/and/or over the low `bits` of
  * each key) — scan-local, codegen'd, and bit-identical across engines,
  * which is what makes the layout key oracle-checkable.
  */
object ZOrder {

  /** Interleave the low `bits` of `a` (even positions) and `b` (odd
    * positions). Keys must fit in `bits` (callers pre-reduce or bucket
    * wider domains; 16 bits/dim covers the test data with room).
    */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The matching SQL expression (DuckDB/ANSI bit operators) — kept next
    * to the Column form so the two interleaves can never drift apart.
    */
  def zvalueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
}
