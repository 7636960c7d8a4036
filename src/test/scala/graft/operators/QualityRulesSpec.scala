package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "buy now buy now buy now buy now"),          // keyword-stuffed
    (2L, "a rich and varied vocabulary in this text"),// healthy
    (3L, "word"),                                     // single token, no bigrams
    (4L, ""))                                         // empty → dropped
    .toDF("doc_id", "text")

  test("repetitionReport computes the documented ratios") {
    val r = QualityRules.repetitionReport(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Double, Double, Double)].collect()
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val d1 = r(0)
    assert(d1._2 == 8)
    assert(d1._3 == 0.25)            // {buy, now} / 8
    // "buy now" occurs 4x of 7 bigrams → covers 8/8 tokens
    assert(d1._5 == 1.0)
    val d3 = r(2)
    assert(d3._2 == 1 && d3._5 == 0.0) // no bigrams → frac 0, not null
  }

  test("repetitionFilter drops stuffed docs, keeps healthy and tiny ones") {
    val kept = QualityRules.repetitionFilter(docs, "doc_id", "text",
        maxTopBigramFrac = 0.5, minDistinctRatio = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("report is layout-independent") {
    val a = QualityRules.repetitionReport(docs, "doc_id", "text")
    val b = QualityRules.repetitionReport(docs.repartition(5), "doc_id", "text")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
