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

  /** Driver-side interleave — the same bit math as [[zvalue]] for the
    * pure-Scala callers (box decomposition, specs).
    */
  def interleave(a: Long, b: Long, bits: Int = 16): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  /** Decompose the 2-D box `[xlo, xhi] × [ylo, yhi]` into the MINIMAL set
    * of disjoint z-value intervals whose union contains exactly the
    * box's points — the query half of a z-ordered layout: a range scan
    * over a Morton-clustered table reads only the files/shards whose
    * z-range intersects one of these intervals, which is how a 2-D
    * predicate prunes MULTIPLICATIVELY (both selectivities) where a
    * single-column sort only ever prunes one dimension.
    *
    * Standard quadtree walk: a quad fully inside the box contributes its
    * (contiguous, alignment-guaranteed) z-range; a disjoint quad
    * nothing; a straddling quad recurses into its 4 children. Runs on
    * the driver in O(perimeter · bits) — purely a function of the
    * predicate constants, never of data — and the intervals are merged
    * when adjacent. Exactness is spec-proven exhaustively.
    */
  def decomposeBox(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                   bits: Int = 16): Seq[(Long, Long)] = {
    require(bits > 0 && bits <= 31, "bits must be in 1..31")
    val max = (1L << bits) - 1
    require(0 <= xlo && xlo <= xhi && xhi <= max &&
      0 <= ylo && ylo <= yhi && yhi <= max,
      s"box [$xlo,$xhi]x[$ylo,$yhi] outside the $bits-bit domain")
    def go(x0: Long, y0: Long, level: Int): Vector[(Long, Long)] = {
      val side = 1L << level
      val (x1, y1) = (x0 + side - 1, y0 + side - 1)
      if (x1 < xlo || x0 > xhi || y1 < ylo || y0 > yhi) Vector.empty
      else if (x0 >= xlo && x1 <= xhi && y0 >= ylo && y1 <= yhi) {
        val zmin = interleave(x0, y0, bits)
        Vector((zmin, zmin + (1L << (2 * level)) - 1))
      } else {
        val h = side / 2
        go(x0, y0, level - 1) ++ go(x0 + h, y0, level - 1) ++
          go(x0, y0 + h, level - 1) ++ go(x0 + h, y0 + h, level - 1)
      }
    }
    val sorted = go(0L, 0L, bits).sortBy(_._1)
    sorted.foldLeft(Vector.empty[(Long, Long)]) {
      case (acc :+ ((lo, hi)), (lo2, hi2)) if lo2 <= hi + 1 =>
        acc :+ (lo, math.max(hi, hi2))
      case (acc, iv) => acc :+ iv
    }
  }

  /** Coarsen an interval list to at most `k` intervals by repeatedly
    * closing the SMALLEST gap — the result is a SUPERSET of the input's
    * union (pruning stays sound, only less sharp), bounding the
    * predicate size a scan pushes down regardless of box shape.
    */
  def coarsen(intervals: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] = {
    require(k >= 1, "k must be >= 1")
    var ivs = intervals.sortBy(_._1).toVector
    while (ivs.size > k) {
      val gi = (1 until ivs.size).minBy(i => ivs(i)._1 - ivs(i - 1)._2)
      ivs = (ivs.take(gi - 1) :+ (ivs(gi - 1)._1, math.max(ivs(gi - 1)._2, ivs(gi)._2))) ++
        ivs.drop(gi + 1)
    }
    ivs
  }
}
