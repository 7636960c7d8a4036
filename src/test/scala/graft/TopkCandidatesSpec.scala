package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The Misra-Gries-style guarantee behind q177, checked against exact
  * corpus counts: merged summaries may undercount a term by at most the
  * dropped mass of the batches it was truncated from, so bounds must
  * bracket the truth and sufficiently heavy terms can never vanish.
  */
class TopkCandidatesSpec extends SparkSpec {

  private lazy val exact = spark.read.parquet(s"$sf0001/documents.parquet")
    .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
    .groupBy(col("tok")).agg(count(lit(1)).as("true_cnt"))

  private lazy val cands = Queries.topkCandidates(spark, sf0001)

  test("bounds bracket the exact count for every candidate") {
    val joined = cands.join(exact, "tok")
      .select(col("tok"), col("lower_bound"), col("upper_bound"), col("true_cnt"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (lo, hi, tru) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo <= tru && tru <= hi,
        s"${r.getString(0)}: true $tru outside [$lo, $hi]")
    }
  }

  test("the top exact terms all surface as candidates (no false negatives)") {
    // any term whose true count exceeds every candidate's possible
    // undercount must be present; the top exact terms trivially qualify
    val topExact = exact.orderBy(col("true_cnt").desc, col("tok"))
      .limit(10).collect().map(_.getString(0)).toSet
    val got = cands.collect().map(_.getString(0)).toSet
    val missing = topExact -- got
    assert(missing.isEmpty, s"heavy terms lost by truncation: $missing")
  }

  test("zipf fit is sane: negative slope, r2 in [0,1], full term count") {
    val r = Queries.zipfFit(spark, sf0001).first()
    assert(r.getLong(0) > 10)
    assert(r.getDouble(1) < 0, s"zipf slope must be negative: ${r.getDouble(1)}")
    val r2 = r.getDouble(3)
    assert(r2 >= 0.0 && r2 <= 1.0)
  }
}
