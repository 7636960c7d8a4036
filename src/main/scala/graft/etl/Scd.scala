package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) merge: fold a new snapshot into a
  * versioned dimension table, closing changed rows and inserting their
  * replacements, keeping full history. The incremental counterpart of the
  * reference's whole-table build→swap refresh (load_tables_daily.py's
  * publish path) and its quarterly history snapshots — instead of
  * rewriting or re-appending the whole table, only keys whose attributes
  * actually changed produce new rows.
  *
  * Scale shape: every step is an equi-join or anti-join on the dimension
  * key — shuffle-partitioned on that one key throughout, no driver
  * materialization, no windows. Dimension snapshots are usually far
  * smaller than facts; at 100 TB the current-rows slice co-partitions with
  * the snapshot on the key and AQE broadcasts whichever side is small.
  */
object Scd {

  /** Merge `snapshot` (key + attribute columns) into `dimension` (same
    * columns + `valid_from`, `valid_to`, `is_current`), stamping rows
    * opened/closed at `newVersion`. Returns the full new dimension:
    *
    *   - historical rows (`is_current = false`) pass through untouched;
    *   - current rows whose attributes all match the snapshot pass through;
    *   - current rows whose attributes differ are CLOSED
    *     (`valid_to = newVersion`, `is_current = false`) and the snapshot
    *     row is inserted as the new current version;
    *   - snapshot keys absent from the dimension are inserted as new
    *     current rows;
    *   - dimension keys absent from the snapshot pass through (absence is
    *     not a delete — matches warehouse dimension practice).
    *
    * Attribute comparison is null-safe (`<=>`), so NULL → value and
    * value → NULL both count as changes.
    */
  def merge(dimension: DataFrame, snapshot: DataFrame, key: String,
            attrs: Seq[String], newVersion: Long): DataFrame = {
    require(attrs.nonEmpty, "at least one attribute column to track")
    val hist = dimension.filter(!col("is_current"))
    val cur = dimension.filter(col("is_current"))

    val changedKeys = snapshot.as("s")
      .join(cur.as("c"), col(s"s.$key") === col(s"c.$key"))
      .filter(attrs.map(a => !(col(s"s.$a") <=> col(s"c.$a"))).reduce(_ || _))
      .select(col(s"s.$key").as(key))
    val newKeys = snapshot.select(col(key))
      .join(cur.select(col(key)), Seq(key), "left_anti")

    val unchanged = cur.join(changedKeys, Seq(key), "left_anti")
    val closed = cur.join(changedKeys, Seq(key), "left_semi")
      .withColumn("valid_to", lit(newVersion))
      .withColumn("is_current", lit(false))
    val opened = snapshot
      .join(changedKeys.union(newKeys), Seq(key), "left_semi")
      .withColumn("valid_from", lit(newVersion))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
      .select(unchanged.columns.map(col).toIndexedSeq: _*)

    hist.unionByName(unchanged).unionByName(closed).unionByName(opened)
  }
}
