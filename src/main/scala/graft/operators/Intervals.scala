package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval overlap JOIN — the non-equi join (a.s ≤ b.e ∧ b.s ≤ a.e)
  * that a naive planner executes as a broadcast-nested-loop over the
  * full cross product. Bucketing by time bin turns it into an
  * equi-join: each interval explodes to the bins it touches (fan-out =
  * interval length / bin + 1, bounded for bounded intervals), the join
  * runs on the bin key, and each qualifying pair is ASSIGNED to exactly
  * one bin — the bin containing the overlap start, `max(s_a, s_b)` —
  * so no distinct over the pair set is ever needed. Pick `binSeconds`
  * near the typical interval length: too small inflates the fan-out,
  * too large degrades toward per-bin cross products (documented
  * tradeoff, same knob as any spatial grid join).
  */
object Intervals {

  /** Overlapping pairs of `a(s_a, e_a, …)` × `b(s_b, e_b, …)` (integer
    * second bounds, inclusive). Returns all columns of both inputs, one
    * row per overlapping pair.
    */
  def overlapJoin(a: DataFrame, b: DataFrame, binSeconds: Long): DataFrame = {
    require(binSeconds >= 1, s"binSeconds must be >= 1, got $binSeconds")
    def binOf(c: org.apache.spark.sql.Column) =
      floor(c / binSeconds).cast("long")
    val ab = a.withColumn("__bin",
      explode(sequence(binOf(col("s_a")), binOf(col("e_a")))))
    val bb = b.withColumn("__bin",
      explode(sequence(binOf(col("s_b")), binOf(col("e_b")))))
    ab.join(bb, Seq("__bin"))
      .filter(col("s_a") <= col("e_b") && col("s_b") <= col("e_a") &&
        binOf(greatest(col("s_a"), col("s_b"))) === col("__bin"))
      .drop("__bin")
  }
}
