package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Physical-plan gates for the round-6 training-data operators: the scale
  * claims ("scan-local", "pruned scan") asserted on the executed plans, not
  * just stated in docs.
  */
class PlanShapeSpec extends SparkSpec {

  private def scanColumns(df: org.apache.spark.sql.DataFrame): Set[String] = {
    // AQE wraps the plan, so walk the whole tree via the string form's
    // ReadSchema entries (stable for the narrow schemas asserted here)
    val plans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.requiredSchema.fieldNames.toSet
    }
    if (plans.nonEmpty) plans.flatten.toSet
    else "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString)
      .flatMap(_.group(1).split(",").map(_.split(":").head.trim))
      .toSet
  }

  private def exchangeCount(df: org.apache.spark.sql.DataFrame): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(
      df.queryExecution.executedPlan.toString).length

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("trainTestSplit's scan prunes to the id column only") {
    // the mix + split label are functions of doc_id alone; nothing else
    // may be read
    val split = operators.Sampling.withSplit(docs, "doc_id")
      .groupBy(col("split")).count()
    assert(scanColumns(split) == Set("doc_id"))
  }

  test("hash sampling and chunking are shuffle-free operators") {
    val sampled = operators.Sampling.hashSample(docs, "doc_id", 0.5)
    assert(exchangeCount(sampled) == 0, "hashSample must not shuffle")
    val chunks = operators.Chunking.tokenWindows(docs, "doc_id", "text")
    assert(exchangeCount(chunks) == 0, "tokenWindows must not shuffle")
    assert(scanColumns(chunks) == Set("doc_id", "text"))
  }

  test("repetitionReport is a single pruned scan with no shuffle") {
    val report = operators.QualityRules.repetitionReport(docs, "doc_id", "text")
    assert(exchangeCount(report) == 0, "token_profile form must not shuffle")
    assert(scanColumns(report) == Set("doc_id", "text"))
  }

  test("suppressExact anti-joins with only the reference side exchanged") {
    val reference = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val plan = operators.Dedup.suppressExact(corpus, reference, "text", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti-join in:\n$plan")
  }
}
