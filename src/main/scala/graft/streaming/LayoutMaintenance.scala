package graft.streaming

import graft.operators.ZoneMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming zone-map maintenance — the streaming sibling of the DQ gate
  * for the DATA LAYOUT: every micro-batch is sharded against the
  * layout's FIXED key domain, appended to the clustered parquet
  * directory, and the zone-map manifest is updated from the batch's own
  * (metadata-sized) statistics — `mergeManifests`' contract live on a
  * stream, so skipping stats stay current without ever rescanning the
  * layout. The manifest store is APPEND-ONLY per batch (one stats row
  * per (batch_id, zshard)); readers reduce it with
  * [[graft.operators.ZoneMap.mergeManifests]]-equivalent aggregation via
  * [[mergedManifest]].
  *
  * Replay idempotence (same two-probe pattern as
  * [[EventStreams.dqProcessBatch]]): the batch's manifest rows are the
  * commit marker, written LAST; layout rows are stamped with batch_id so
  * a replay that crashed between the data append and the manifest write
  * skips the re-append and redoes only the marker. Both probes are
  * batch_id-equality filters pruned by parquet column stats.
  */
object LayoutMaintenance {

  /** Start-ready sink: shard on `keyCol` over the fixed [dmin, dmax]
    * domain into `n` zones, append to `layoutPath`, maintain
    * `manifestPath`.
    */
  def zoneMapMaintainedSink(stream: DataFrame, keyCol: String, n: Int,
                            dmin: Long, dmax: Long,
                            layoutPath: String, manifestPath: String,
                            checkpointDir: String) =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        zoneMapProcessBatch(batch, batchId, keyCol, n, dmin, dmax,
          layoutPath, manifestPath)
      }

  /** One micro-batch of the maintained layout — exposed so the replay
    * contract is directly testable.
    */
  private[graft] def zoneMapProcessBatch(batch: DataFrame, batchId: Long,
                                         keyCol: String, n: Int,
                                         dmin: Long, dmax: Long,
                                         layoutPath: String,
                                         manifestPath: String): Unit = {
    val spark = batch.sparkSession
    def hasBatch(path: String): Boolean =
      try !spark.read.parquet(path)
        .filter(col("batch_id") === batchId).isEmpty
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (!hasBatch(manifestPath)) {
      val sharded = ZoneMap.withShard(batch, keyCol, n, dmin, dmax)
        .withColumn("batch_id", lit(batchId))
      sharded.persist()
      try {
        if (!hasBatch(layoutPath)) ZoneMap.appendLayout(sharded, layoutPath)
        ZoneMap.manifest(sharded, keyCol)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(manifestPath)
      } finally sharded.unpersist()
    }
  }

  /** Reduce the per-batch manifest store to the live zone map — the
    * N-way form of [[ZoneMap.mergeManifests]] (min/max/count are
    * mergeable, so a single aggregation over |batches| × |zones| stats
    * rows replaces any rescan).
    */
  def mergedManifest(spark: SparkSession, manifestPath: String): DataFrame =
    spark.read.parquet(manifestPath)
      .groupBy(col("zshard"))
      .agg(min(col("min_key")).as("min_key"),
        max(col("max_key")).as("max_key"),
        sum(col("n_rows")).as("n_rows"))

  /** Streaming DISTINCT-COUNT maintenance — the sketch sibling of the
    * zone-map sink: every micro-batch reduces to one binary HLL row per
    * group ([[graft.operators.Sketches.hllByGroup]]) appended to a stats
    * store; [[mergedDistincts]] unions the registers at read time, so
    * "distinct users per type over all time" never rescans history. The
    * per-batch sketch rows double as their own commit marker (single
    * write per batch — replays skip on batch_id, nothing can half-land).
    */
  def hllMaintainedSink(stream: DataFrame, groupCol: String, valueCol: String,
                        statsPath: String, checkpointDir: String,
                        lgK: Int = 12) =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        hllProcessBatch(batch, batchId, groupCol, valueCol, statsPath, lgK)
      }

  private[graft] def hllProcessBatch(batch: DataFrame, batchId: Long,
                                     groupCol: String, valueCol: String,
                                     statsPath: String, lgK: Int = 12): Unit = {
    val spark = batch.sparkSession
    val already =
      try !spark.read.parquet(statsPath)
        .filter(col("batch_id") === batchId).isEmpty
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (!already)
      graft.operators.Sketches.hllByGroup(batch, groupCol, valueCol, lgK)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(statsPath)
  }

  /** Merge the per-batch sketch store to live estimates per group. */
  def mergedDistincts(spark: SparkSession, statsPath: String,
                      groupCol: String): DataFrame =
    graft.operators.Sketches.hllMergeByGroup(
      spark.read.parquet(statsPath), groupCol)

  /** Streaming HEAVY-HITTER maintenance — the deterministic-bounds
    * sibling of [[hllMaintainedSink]], maintaining the q177
    * SpaceSaving-style summaries live: every micro-batch keeps only its
    * top-`k` keys by count plus ONE `dropped_max` scalar row (flagged by
    * `is_marker` — NOT by a NULL key, which a real NULL stream key could
    * forge — the largest truncated count), appended to a stats store that stays
    * ≤ |batches|·(k+1) rows no matter how much data streamed through.
    * [[mergedTopk]] reconstructs, for every surviving key, a LOWER bound
    * (the kept counts, an undercount only where a batch truncated the
    * key) and an UPPER bound (lower + Σ dropped_max over the batches
    * where the key is absent) — so any key whose true global count
    * exceeds Σ dropped_max is guaranteed present, and the bounds are
    * exact arithmetic, replayable by any engine. The per-batch sketch
    * rows double as the commit marker (single write per batch — replays
    * skip on batch_id, nothing can half-land).
    */
  def topkMaintainedSink(stream: DataFrame, keyCol: String, k: Int,
                         statsPath: String, checkpointDir: String) =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        topkProcessBatch(batch, batchId, keyCol, k, statsPath)
      }

  private[graft] def topkProcessBatch(batch: DataFrame, batchId: Long,
                                      keyCol: String, k: Int,
                                      statsPath: String): Unit = {
    val spark = batch.sparkSession
    val already =
      try !spark.read.parquet(statsPath)
        .filter(col("batch_id") === batchId).isEmpty
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (!already) {
      val counts = batch
        .groupBy(col(keyCol).cast("string").as("key"))
        .agg(count(lit(1)).as("cnt"))
      // consumed three times (top-k + both anti-join sides); cache so
      // the batch isn't re-aggregated per consumer. The top-k cut is a
      // TakeOrdered (distributed partial top-k per partition), NEVER a
      // global row_number window — the count table is vocabulary-sized.
      counts.persist()
      try {
        val kept = counts.orderBy(col("cnt").desc, col("key")).limit(k)
        // null-safe anti join: a real NULL stream key groups to key=NULL
        // and may legitimately occupy a top-k slot; plain equi-join
        // would never match it and double-count it into dropped_max.
        val dropped = counts.as("c")
          .join(kept.select(col("key").as("k")),
            col("c.key") <=> col("k"), "left_anti")
          .agg(coalesce(max(col("cnt")), lit(0L)).as("cnt"))
          .select(lit(null).cast("string").as("key"), col("cnt"),
            lit(true).as("is_marker"))
        kept.withColumn("is_marker", lit(false)).unionAll(dropped)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(statsPath)
      } finally counts.unpersist()
    }
  }

  /** Reduce the per-batch top-k store to (key, lower_bound, upper_bound,
    * n_batches_present) — the q177 merge law over the streamed store.
    */
  def mergedTopk(spark: SparkSession, statsPath: String): DataFrame = {
    val stats = spark.read.parquet(statsPath)
    val kept = stats.filter(!col("is_marker"))
    val dropped = stats.filter(col("is_marker"))
      .select(col("batch_id"), col("cnt").as("dropped_max"))
    val totalDropped = dropped
      .agg(coalesce(sum(col("dropped_max")), lit(0L)).as("total_dropped"))
    kept
      .join(broadcast(dropped), Seq("batch_id"), "left")
      .na.fill(0L, Seq("dropped_max"))
      .groupBy(col("key"))
      .agg(sum(col("cnt")).as("lower_bound"),
        count(lit(1)).as("n_batches_present"),
        sum(col("dropped_max")).as("present_dropped"))
      .crossJoin(broadcast(totalDropped))
      .select(col("key"), col("lower_bound"),
        (col("lower_bound") + col("total_dropped") - col("present_dropped"))
          .as("upper_bound"),
        col("n_batches_present"))
  }
}
