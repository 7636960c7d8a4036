package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mergeable-sketch contract (the ZoneMap.mergeManifests story for
  * statistics): merging per-batch sketches must equal sketching the
  * union — exactly, since HLL union is register-wise max and CMS merge
  * is counter-wise add — and estimates must stay inside the sketch
  * family's error envelope against exact answers.
  */
class SketchesSpec extends SparkSpec {

  private def events = graft.Tables(spark, sf0001, "events")

  test("HLL: merge of per-batch sketches equals the sketch of the union (sparse exact mode)") {
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 === 1)
    val merged = Sketches.hllMergeByGroup(
        Sketches.hllByGroup(a, "event_type", "user_id")
          .unionByName(Sketches.hllByGroup(b, "event_type", "user_id")),
        "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.hllMergeByGroup(
        Sketches.hllByGroup(events, "event_type", "user_id"), "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct,
      s"sketch union is not lossless: merged=$merged direct=$direct")
  }

  test("HLL estimates stay within the lgK=12 error envelope of exact distinct counts") {
    val est = Sketches.hllMergeByGroup(
        Sketches.hllByGroup(events, "event_type", "user_id"), "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(est(k) - e) <= math.max(3, 0.05 * e),
        s"$k: est ${est(k)} vs exact $e exceeds 5%")
    }
  }

  test("CMS: merge of per-batch sketches equals the single-pass sketch, exactly") {
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 2 === 1)
    val mergedBytes = Sketches.cmsByGroup(a, "event_type", "user_id")
      .unionByName(Sketches.cmsByGroup(b, "event_type", "user_id"))
      .groupBy(col("event_type"))
      .agg(Sketches.cmsMerge(col("cms")).as("cms"))
    val directBytes = Sketches.cmsByGroup(events, "event_type", "user_id")
    val probes = Seq(1L, 7L, 42L, 123L)
    val m = mergedBytes.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val d = directBytes.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(m.keySet == d.keySet)
    m.keySet.foreach { k =>
      probes.foreach { p =>
        assert(Sketches.cmsEstimate(m(k), p) == Sketches.cmsEstimate(d(k), p),
          s"merged CMS diverges from single-pass at ($k, $p)")
      }
    }
  }

  test("CMS estimates never undercount and respect the eps envelope") {
    val sketch = Sketches.cmsByGroup(events, "event_type", "user_id",
        eps = 0.001, confidence = 0.99)
      .filter(col("event_type") === "click").collect()(0).getAs[Array[Byte]](1)
    val exact = events.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.take(50).foreach { case (u, n) =>
      val e = Sketches.cmsEstimate(sketch, u)
      assert(e >= n, s"CMS undercounted user $u: $e < $n")
      assert(e <= n + (0.001 * total).toLong + 1,
        s"CMS overcount beyond eps envelope for user $u: $e vs $n (total $total)")
    }
  }

  private def histRows(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
    df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("hist: merge of per-batch sketches equals the single-pass sketch, exactly") {
    val batches = (0 until 3).map(i =>
      Sketches.histByGroup(events.filter(col("event_id") % 3 === i),
        "event_type", "value", lo = 0.0, width = 25.0, nBins = 20))
    val merged = histRows(
      Sketches.histMergeByGroup(batches.reduce(_ unionAll _), "event_type"))
    val direct = histRows(
      Sketches.histByGroup(events, "event_type", "value", 0.0, 25.0, 20))
    assert(merged == direct,
      s"hist merge is not lossless: merged=$merged direct=$direct")
    assert(merged.values.forall(_.length == 20), "sketch width drifted")
  }

  test("hist: out-of-range values clamp into the edge bins; counts are total") {
    import spark.implicits._
    val df = Seq(("a", -5.0), ("a", 0.0), ("a", 9.9), ("a", 10.0),
      ("a", 99.9), ("a", 1e9)).toDF("g", "v")
    val h = histRows(Sketches.histByGroup(df, "g", "v", 0.0, 10.0, 10))("a")
    assert(h.sum == 6, s"rows lost in clamping: $h")
    assert(h(0) == 3 && h(1) == 1 && h(9) == 2, s"clamp bins wrong: $h")
  }
}
