package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "a"), (3L, "x" * 1000))
    .toDF("doc_id", "text")

  test("binary payload column carries UTF-8 bytes") {
    val bin = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val r = bin.filter($"id" === 1).select(octet_length($"payload")).first().getInt(0)
    assert(r == 11)
  }

  test("mapPartitions decode and columnar meta agree (stub decode is the seam)") {
    val bin = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val viaPartitions = Multimodal.decodeMeta(spark, bin)
      .collect().map(m => (m.id, m.byteLen, m.width, m.height, m.format)).toSet
    val viaColumns = Multimodal.metaColumns(bin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toSet
    assert(viaPartitions == viaColumns)
    assert(viaPartitions.exists(_._1 == 3L))
    val big = viaPartitions.find(_._1 == 3L).get
    assert(big._2 == 1000 && big._3 == 64 + (1000 % 512))
  }

  test("frame sampling explodes evenly spaced offsets") {
    val bin = Multimodal.withBinaryPayload(docs.filter($"doc_id" === 3), "doc_id", "text")
    val frames = Multimodal.sampleFrames(bin, everyNBytes = 100).collect()
    assert(frames.length == 10) // offsets 0,100,...,900
    assert(frames.map(_.getInt(2)).toSeq.sorted == (0 until 1000 by 100).toSeq)
  }

  test("byte-histogram features: normalized, deterministic, ANN-composable") {
    val bin = Multimodal.withBinaryPayload(docs, "doc_id", "text")
    val feats = Multimodal.byteHistogram(spark, bin, bins = 16)
    val rows = feats.collect().map(f => f.id -> f.embedding).toMap
    assert(rows.values.forall(_.length == 16))
    // histogram of a non-empty payload sums to 1
    assert(math.abs(rows(1L).sum - 1f) < 1e-5)
    // identical payloads → identical features
    val dup = Multimodal.byteHistogram(spark,
      Multimodal.withBinaryPayload(docs, "doc_id", "text"), bins = 16)
      .collect().map(f => f.id -> f.embedding.toSeq).toMap
    assert(dup(1L) == rows(1L).toSeq)
    // the features column feeds the similarity operators directly:
    // binary → features → exact top-k is the full multimodal loop
    val topk = graft.operators.Similarity.bruteForceTopK(
      feats.toDF().withColumnRenamed("id", "vec_id"),
      feats.toDF().withColumnRenamed("id", "vec_id").filter($"vec_id" === 1), k = 2)
    assert(topk.count() == 2)
  }

  test("resizePlan emits target geometry and scale factors columnar") {
    val meta = Multimodal.metaColumns(
      Multimodal.withBinaryPayload(docs, "doc_id", "text"))
    val plan = Multimodal.resizePlan(meta, 224, 224).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val (w, sx) = (r.getInt(1), r.getDouble(5))
      assert(math.abs(sx - 224.0 / w) < 1e-3)
      assert(r.getBoolean(7) == (r.getInt(1) != 224 || r.getInt(2) != 224))
    }
  }
}
