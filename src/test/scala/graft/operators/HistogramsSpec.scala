package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sketch-bounded histogram must stay within the GK rank-error budget
  * of perfect balance — the quantitative version of "the approx swap is
  * the 100 TB path" stated at q123.
  */
class HistogramsSpec extends SparkSpec {

  test("approx equi-depth buckets balance within the GK rank-error budget") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val k = 8
    val accuracy = 1000
    val h = Histograms.equidepthApprox(li, "l_extendedprice", k, accuracy).collect()
    val n = li.count()
    assert(h.map(_.getLong(1)).sum == n, "every row lands in exactly one bucket")
    assert(h.length == k)
    // each of a bucket's two bounds carries rank error <= n/accuracy
    val budget = 2.0 * n / accuracy + 1
    h.foreach { r =>
      assert(math.abs(r.getLong(1) - n.toDouble / k) <= budget,
        s"bucket ${r.getInt(0)} holds ${r.getLong(1)}, n/k=${n / k} ± $budget")
    }
    // ranges ordered and disjoint, same contract as the exact form
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2))
    }
  }

  test("integer-typed value column works (cast happens inside the sketch)") {
    // approx_percentile returns an array of the INPUT type; before the
    // in-aggregate cast this threw ClassCastException for long columns
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_quantity").cast("long").as("q"))
    val h = Histograms.equidepthApprox(li, "q", 4, 1000).collect()
    assert(h.map(_.getLong(1)).sum == li.count())
    assert(h.length <= 4 && h.nonEmpty)
  }

  test("empty input yields an empty frame with the histogram schema, not an NPE") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(lit(false))
    val h = Histograms.equidepthApprox(li, "l_extendedprice", 8)
    assert(h.columns.toSeq == Seq("bucket", "n_rows", "lo", "hi"))
    assert(h.count() == 0)
  }
}
