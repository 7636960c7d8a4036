package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition / diversity quality signals in the Gopher-rules style:
  * documents dominated by a single repeated phrase, or with collapsed
  * vocabulary, are low-quality training text regardless of length. All
  * signals are per-document; the only non-scan-local step is the top-bigram
  * count (a (doc, gram) count + per-doc max — two partial-agg-friendly
  * aggregations keyed by doc id).
  */
object QualityRules {

  /** Per-document report: token count, distinct-token ratio, mean token
    * length, and the fraction of tokens covered by the document's most
    * frequent bigram (0 for documents with fewer than 2 tokens). Zero-token
    * documents are dropped (no denominators).
    */
  def repetitionReport(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__t"))
      .withColumn("n_tokens", size(col("__t")))
      .filter(col("n_tokens") > 0)

    // sequence(0, n-2) is DESCENDING for n < 2 (Spark fills stop < start
    // with step -1), so the bigram list must be guarded, not clipped.
    val bigrams = base
      .filter(col("n_tokens") >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("n_tokens") - 2),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(2))))).as("__gram"))
    val topBigram = bigrams
      .groupBy(col("doc_id"), col("__gram")).agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id")).agg(max(col("__c")).as("__top"))

    base.join(topBigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(size(array_distinct(col("__t"))).cast("double") / col("n_tokens"), 4)
          .as("distinct_ratio"),
        round(aggregate(col("__t"), lit(0L), (acc, x) => acc + length(x)).cast("double")
          / col("n_tokens"), 4).as("mean_token_len"),
        round(coalesce(col("__top") * 2, lit(0L)).cast("double") / col("n_tokens"), 4)
          .as("top_bigram_frac"))
  }

  /** The filter built on the report: keep documents below the repetition
    * ceiling and above the diversity floor — the composable "drop the
    * keyword-stuffed and the copy-pasted" cleaning step.
    */
  def repetitionFilter(docs: DataFrame, idCol: String, textCol: String,
                       maxTopBigramFrac: Double = 0.2,
                       minDistinctRatio: Double = 0.3): DataFrame = {
    val report = repetitionReport(docs, idCol, textCol)
      .filter(col("top_bigram_frac") <= maxTopBigramFrac &&
        col("distinct_ratio") >= minDistinctRatio)
      .select(col("doc_id"))
    docs.join(report, docs(idCol) === report("doc_id"), "left_semi")
  }
}
