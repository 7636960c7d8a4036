package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage release for localCheckpoint'd DataFrames.
  *
  * `Dataset.unpersist` only evicts CacheManager entries; the RDD that
  * `localCheckpoint` persisted (MEMORY_AND_DISK, registered in
  * `sc.getPersistentRDDs`) is NOT a CacheManager cache, so unpersisting
  * the checkpointed Dataset is a silent no-op and every iterative loop
  * that checkpoints per round would accumulate one pinned RDD per round
  * until driver GC happens to trigger the ContextCleaner. On a 1000-
  * executor run of a long CC/BPE loop that is the difference between
  * "peak storage = two tables" and an executor-storage leak. The
  * checkpointed plan is a [[LogicalRDD]] leaf holding exactly the
  * persisted RDD — unpersist THAT.
  */
object Checkpoints {

  /** Release the storage behind a `localCheckpoint()` result. No-op for
    * non-checkpointed frames (plan is not a bare LogicalRDD).
    */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _              => ()
  }
}
