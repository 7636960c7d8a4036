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

  test("native token_profile matches the relational formulation on real docs") {
    // reference implementation: explode bigrams, count, max, join — the
    // 2-scan relational shape the native single-pass expression replaced
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = docs
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("__t"))
      .withColumn("n_tokens", size(col("__t")))
      .filter(col("n_tokens") > 0)
    val topBigram = base.filter(col("n_tokens") >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("n_tokens") - 2),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(2))))).as("__gram"))
      .groupBy(col("doc_id"), col("__gram")).agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id")).agg(max(col("__c")).as("__top"))
    val reference = base.join(topBigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(size(array_distinct(col("__t"))).cast("double") / col("n_tokens"), 4)
          .as("distinct_ratio"),
        round(aggregate(col("__t"), lit(0L), (acc, x) => acc + length(x)).cast("double")
          / col("n_tokens"), 4).as("mean_token_len"),
        round(coalesce(col("__top") * 2, lit(0L)).cast("double") / col("n_tokens"), 4)
          .as("top_bigram_frac"))
    val native = QualityRules.repetitionReport(docs, "doc_id", "text")
    assert(native.except(reference).isEmpty && reference.except(native).isEmpty)
  }
}
