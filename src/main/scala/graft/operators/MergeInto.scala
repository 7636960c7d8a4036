package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** General MERGE INTO — the lakehouse upsert: one full-outer join on the
  * key decides every row's fate. Matched target rows are UPDATED to the
  * source row (or DELETED when `deleteCond` holds on it), unmatched
  * source rows are INSERTED, unmatched target rows survive unchanged —
  * predicate-driven actions, where [[graft.Queries.cdcApply]]'s
  * changelog form is op-driven and seq-ordered. Both frames must share
  * the schema; the key must be unique per side (the relational MERGE
  * contract — ANSI raises on duplicate matches, we document it).
  *
  * Scale posture: ONE shuffle on the key for the join (co-located if the
  * target table is bucketed on it, TableLifecycle.publishBucketed), and
  * the row arbitration is a scan-local struct CASE — no window, no
  * second pass, output partitioning inherited for the write-back.
  */
object MergeInto {

  def mergeInto(target: DataFrame, source: DataFrame, key: String,
                deleteCond: Column = lit(false)): DataFrame = {
    val tCols = target.columns.toSeq
    require(source.columns.toSeq == tCols,
      s"schema mismatch: target $tCols vs source ${source.columns.toSeq}")
    val t = target.select(col(key).as("__k"), struct(tCols.map(col): _*).as("__t"))
    val s = source.select(col(key).as("__k"), struct(tCols.map(col): _*).as("__s"),
      deleteCond.as("__del"))
    t.join(s, Seq("__k"), "full_outer")
      .withColumn("__out",
        when(col("__s").isNull, col("__t"))
          .when(col("__del"), lit(null))
          .otherwise(col("__s")))
      .filter(col("__out").isNotNull)
      .select(tCols.map(c => col(s"__out.$c")): _*)
  }
}
