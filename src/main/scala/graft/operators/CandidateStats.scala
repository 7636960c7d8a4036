package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE audited estimator of LSH candidate volume, shared by every
  * cost gate that routes on it — the SRP→IVF route
  * ([[Similarity.cosineNearDupPairs]]) and the minhash grid-vs-join
  * verify crossover ([[Dedup.shuffleVerify]]). Three near-identical
  * inline copies of this aggregate had started to drift (r14 audit);
  * keeping the arithmetic in one place means a fix or a recalibration
  * lands in every gate at once, and the uniform log line makes every
  * routing decision greppable the same way.
  */
object CandidateStats extends org.apache.spark.internal.Logging {

  /** Exact expected raw (pre-dedup) within-bucket collision count:
    * Σ C(bucket, 2) over the banded table grouped by `bucketCols`. One
    * linear job over fixed-width band rows — the partial count collapses
    * map-side, so the exchange carries one row per distinct bucket.
    * `c·(c−1) DIV 2` stays in Long range: c ≤ N and N² < 2⁶³ for any
    * corpus a band table can hold.
    */
  def rawCollisions(banded: DataFrame, bucketCols: Seq[String],
                    caller: String): Long = {
    val v = banded
      .groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) DIV 2")), lit(0L)))
      .head().getLong(0)
    logInfo(s"$caller: est raw band collisions $v " +
      s"(exact Σ C(bucket,2) over (${bucketCols.mkString(", ")}))")
    v
  }

  /** Average per-doc candidate degree implied by a collision count — the
    * quantity the grid-vs-join crossover compares against 2P.
    */
  def pairDegree(rawCollisions: Long, nDocs: Long): Double =
    rawCollisions.toDouble / math.max(nDocs, 1L)
}
