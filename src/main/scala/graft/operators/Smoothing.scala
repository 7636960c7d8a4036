package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trailing exponentially-weighted moving average over a daily time
  * series — the metric-smoothing / trend-detection primitive (crawl
  * volume drift, per-source quality trend in a training-data
  * dashboard). For each present day d the smoothed value is the
  * weighted mean of the series over days (d-window+1 .. d) with weight
  * base^(d - d_i), so gaps in the calendar simply contribute nothing
  * (gap-robust: the normalizer only sums weights of observed days).
  *
  * Scale posture: the textbook formulations are a running recurrence
  * (an order-dependent fold Spark windows cannot express) or a
  * per-day range self-join (O(n·window) pairs through a join). This is
  * instead a lag SPRAY: each observed day broadcasts its value forward
  * onto the `window` anchor days it influences via one `explode` over
  * a literal lag array — a pure per-row map — and one combinable
  * groupBy reassembles every anchor's weighted mean. One shuffle on
  * (keys, day), no join, no window function; weights use an exact
  * dyadic base (default 0.5) so pow is bit-exact in any engine.
  */
object Smoothing {

  /** EWMA of `valCol` per `keys` over trailing `window` days of
    * `dateCol` (a date column). Emits only days present in the input
    * (anchor days are semi-joined against the observed day set, which
    * is calendar-bounded and broadcast). Output: keys, dateCol, ewma.
    */
  def ewmaTrailing(df: DataFrame, keys: Seq[String], dateCol: String,
                   valCol: Column, window: Int = 14,
                   base: Double = 0.5): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(base > 0 && base < 1, s"base must be in (0,1), got $base")
    val keyCols = keys.map(col)
    val daily = df.groupBy(keyCols :+ col(dateCol): _*)
      .agg(valCol.as("__v"))
    val lags = array((0 until window).map(lit): _*)
    val sprayed = daily
      .select(keyCols ++ Seq(col(dateCol), col("__v"), explode(lags).as("__lag")): _*)
      .select(keyCols ++ Seq(
        date_add(col(dateCol), col("__lag")).as(dateCol),
        (col("__v") * pow(lit(base), col("__lag"))).as("__wv"),
        pow(lit(base), col("__lag")).as("__w")): _*)
    val observed = daily.select(keyCols :+ col(dateCol): _*)
    sprayed
      .join(broadcast(observed), keys :+ dateCol, "semi")
      .groupBy(keyCols :+ col(dateCol): _*)
      .agg((sum(col("__wv")) / sum(col("__w"))).as("ewma"))
  }
}
