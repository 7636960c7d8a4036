package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated under
  * (maximize `maxCol`, minimize `minCol`) — the multi-objective
  * shortlist query (best price-for-size catalog picks, best
  * quality-for-length documents in a training-data triage).
  *
  * Dominance: row b dominates row a iff b.max >= a.max and
  * b.min <= a.min with at least one strict. Ties on BOTH dimensions
  * dominate neither way, so coincident frontier points all survive.
  *
  * Scale posture: the textbook NOT EXISTS formulation is an O(n²)
  * self-join; this is instead one full-data aggregate plus one window
  * over |distinct maxCol| rows. Per-x best values are computed with a
  * combinable min; the strict-prefix running min over x-descending
  * order needs a single-partition window, but only over the per-x
  * aggregate (bounded by the x domain, e.g. 50 part sizes — never the
  * data); the frontier stats then broadcast back onto one scan. The
  * data itself is touched by exactly two scans and one shuffle (the
  * per-x aggregate); nothing collects.
  */
object Skyline {

  /** Rows of `df` on the (maximize `maxCol`, minimize `minCol`) frontier. */
  def frontier2D(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val perX = df.groupBy(col(maxCol)).agg(min(col(minCol)).as("__best"))
    // strict prefix (rows with larger maxCol only): one row per distinct
    // x value, so no frame ambiguity from orderBy ties
    val w = Window.orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val stats = perX.withColumn("__min_larger", min(col("__best")).over(w))
    df.join(broadcast(stats), maxCol)
      .filter(col(minCol) === col("__best") &&
        (col("__min_larger").isNull || col("__min_larger") > col(minCol)))
      .drop("__best", "__min_larger")
  }
}
