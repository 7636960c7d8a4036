package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SmoothingSpec extends SparkSpec {
  import spark.implicits._

  private def ewma(rows: Seq[(String, String, Double)], window: Int,
                   base: Double = 0.5): Map[(String, String), Double] = {
    val df = rows.toDF("k", "ds", "v").withColumn("d", to_date(col("ds")))
    Smoothing.ewmaTrailing(df, Seq("k"), "d", sum(col("v")), window, base)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2))
      .toMap
  }

  test("matches the hand-computed weighted mean over a dense run") {
    val rows = Seq(("a", "2024-01-01", 10.0), ("a", "2024-01-02", 20.0),
      ("a", "2024-01-03", 40.0))
    val r = ewma(rows, window = 14)
    assert(math.abs(r(("a", "2024-01-01")) - 10.0) < 1e-12)
    // day2: (20 + 0.5*10)/(1.5)
    assert(math.abs(r(("a", "2024-01-02")) - 25.0 / 1.5) < 1e-12)
    // day3: (40 + 0.5*20 + 0.25*10)/(1.75)
    assert(math.abs(r(("a", "2024-01-03")) - 52.5 / 1.75) < 1e-12)
  }

  test("gaps contribute nothing: weights renormalize over observed days") {
    val rows = Seq(("a", "2024-01-01", 10.0), ("a", "2024-01-04", 40.0))
    val r = ewma(rows, window = 14)
    // day4 sees day1 at lag 3: (40 + 0.125*10)/(1.125)
    assert(math.abs(r(("a", "2024-01-04")) - 41.25 / 1.125) < 1e-12)
    assert(r.size == 2, "gap days must not appear in the output")
  }

  test("observations beyond the window fall out entirely") {
    val rows = Seq(("a", "2024-01-01", 100.0), ("a", "2024-01-05", 40.0))
    val r = ewma(rows, window = 3)
    assert(math.abs(r(("a", "2024-01-05")) - 40.0) < 1e-12,
      "lag-4 observation leaked into a window-3 EWMA")
  }

  test("series are independent per key and duplicate day rows pre-aggregate") {
    val rows = Seq(("a", "2024-01-01", 1.0), ("a", "2024-01-01", 3.0),
      ("b", "2024-01-02", 7.0))
    val r = ewma(rows, window = 5)
    assert(math.abs(r(("a", "2024-01-01")) - 4.0) < 1e-12)
    assert(math.abs(r(("b", "2024-01-02")) - 7.0) < 1e-12)
  }
}
