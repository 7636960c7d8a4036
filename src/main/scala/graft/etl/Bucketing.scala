package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout: pre-shuffle a fact table ONCE at write time so
  * every subsequent equi-join / aggregation on the bucket key runs with no
  * exchange at all. This is the standard 100 TB answer to "lineitem joins
  * orders every night": pay the shuffle once when the table lands, not per
  * query. Spark's bucketing metadata (hash(key) mod n per file) lets the
  * planner prove co-partitioning, so two tables bucketed the same way
  * sort-merge-join directly file-against-file — BucketingSpec asserts the
  * executed plan contains zero shuffle exchanges.
  *
  * Sizing at scale: pick numBuckets so a single bucket of the LARGER table
  * fits an executor's memory slice (≈ table_size / numBuckets ≤ a few
  * hundred MB); both sides must use the same numBuckets and key. `sortBy`
  * on the bucket key additionally removes the per-task sort from the merge
  * join's first run.
  */
object Bucketing {

  /** Write `df` as a parquet-backed managed table bucketed (and sorted)
    * by `key` — the once-per-landing shuffle that all later joins skip.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two identically bucketed tables on their bucket key. The
    * join itself is nothing special — co-location is a property of the
    * table layout; any equi-join on the key gets the shuffle-free plan.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
