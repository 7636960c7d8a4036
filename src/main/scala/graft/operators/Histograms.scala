package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Histogram builders for ANALYZE-style statistics.
  *
  * The oracle-checked exact form lives in Queries.equidepthHistogram
  * (q123): bounds from an exact `percentile`, whose per-group value
  * buffer is CI-affordable but not the 100 TB path. This is that path:
  * bounds from the GK sketch (`approx_percentile`, bounded memory,
  * strictly combinable), so the whole histogram is two scans with
  * scan-local everything in between, at any scale. The trade is bucket
  * balance: each bound carries rank error ≤ n/accuracy, so a bucket's
  * population deviates from n/k by at most 2n/accuracy (gated in
  * HistogramsSpec against the exact form).
  */
object Histograms {

  def equidepthApprox(df: DataFrame, valueCol: String,
                      k: Int = 8, accuracy: Int = 10000): DataFrame = {
    require(k > 1, "k must be at least 2")
    val ps = (1 until k).map(i => i.toDouble / k)
    // cast inside the aggregate: approx_percentile returns an array of the
    // INPUT type, so an int/long/decimal column would CCE at getSeq[Double]
    val row = df
      .agg(expr(s"approx_percentile(CAST($valueCol AS DOUBLE)," +
        s" array(${ps.mkString(",")}), $accuracy)"))
      .first()
    // empty / all-null input: no bounds — single bucket 0 over zero rows,
    // i.e. an empty frame with the histogram schema rather than an NPE
    val bounds: Seq[Double] = if (row.isNullAt(0)) Nil else row.getSeq[Double](0)
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(valueCol) > lit(b), 1).otherwise(0)
    }
    df.select(bucket.as("bucket"), col(valueCol).as("x"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("bucket"))
  }
}
