package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  // key 1: unchanged; key 2: attribute changes; key 3: absent from the
  // snapshot (must survive); key 4: new in the snapshot; key 5: already has
  // history (closed row must pass through untouched); key 6: NULL → value
  // change (null-safe compare)
  private def dim = Seq(
    (1L, Some("a"), 0L, None, true),
    (2L, Some("b"), 0L, None, true),
    (3L, Some("c"), 0L, None, true),
    (5L, Some("old"), 0L, Some(1L), false),
    (5L, Some("mid"), 1L, None, true),
    (6L, None: Option[String], 0L, None, true))
    .toDF("k", "attr", "valid_from", "valid_to", "is_current")

  private def snap = Seq(
    (1L, Some("a")), (2L, Some("B2")), (4L, Some("d")),
    (5L, Some("mid")), (6L, Some("now-set")))
    .toDF("k", "attr")

  private def merged = Scd.merge(dim, snap, "k", Seq("attr"), newVersion = 2L)

  test("unchanged, absent, and historical rows pass through untouched") {
    val out = merged.as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(out.contains((1L, Some("a"), 0L, None, true)))   // unchanged
    assert(out.contains((3L, Some("c"), 0L, None, true)))   // absent ≠ delete
    assert(out.contains((5L, Some("old"), 0L, Some(1L), false))) // history kept
    assert(out.contains((5L, Some("mid"), 1L, None, true))) // current match
  }

  test("changed keys get closed old row + opened new row") {
    val k2 = merged.filter(col("k") === 2).orderBy("valid_from")
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSeq
    assert(k2 == Seq(
      (2L, Some("b"), 0L, Some(2L), false),
      (2L, Some("B2"), 2L, None, true)))
  }

  test("NULL to value counts as a change (null-safe compare)") {
    val k6 = merged.filter(col("k") === 6).orderBy("valid_from")
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSeq
    assert(k6 == Seq(
      (6L, None, 0L, Some(2L), false),
      (6L, Some("now-set"), 2L, None, true)))
  }

  test("new keys insert as current version-stamped rows") {
    val k4 = merged.filter(col("k") === 4)
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSeq
    assert(k4 == Seq((4L, Some("d"), 2L, None, true)))
  }

  test("merge composes with foreachBatch: streaming dimension maintenance") {
    // the standard shape: a stream of snapshot updates folds into the
    // dimension one micro-batch at a time; versions advance per batch.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String)]
    var dim = Seq((1L, Some("a"), 0L, None: Option[Long], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val q = in.toDS().toDF("k", "attr")
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // localCheckpoint: the dimension accumulates across batches; without
        // truncation each batch's plan would embed all previous merges
        dim = Scd.merge(dim, batch, "k", Seq("attr"), newVersion = batchId + 1)
          .localCheckpoint(true)
      }.start()
    try {
      in.addData((1L, "a2"), (9L, "fresh"))
      q.processAllAvailable()
      in.addData((1L, "a3"))
      q.processAllAvailable()
    } finally q.stop()
    val k1 = dim.filter(col("k") === 1).orderBy("valid_from")
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSeq
    assert(k1 == Seq(
      (1L, Some("a"), 0L, Some(1L), false),
      (1L, Some("a2"), 1L, Some(2L), false),
      (1L, Some("a3"), 2L, None, true)))
    val k9 = dim.filter(col("k") === 9)
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSeq
    assert(k9 == Seq((9L, Some("fresh"), 1L, None, true)))
  }

  test("exactly one current row per live key after merge") {
    val dupCurrent = merged.filter(col("is_current"))
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(dupCurrent == 0)
    // idempotence: merging the same snapshot again changes nothing
    val again = Scd.merge(merged, snap, "k", Seq("attr"), newVersion = 3L)
    assert(again.except(merged).isEmpty && merged.except(again).isEmpty)
  }
}
