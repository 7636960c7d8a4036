package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable sketch COLUMNS — distinct-count (HLL) and frequency (CMS)
  * sketches materialized per partition/batch as binary columns, plus the
  * merge aggregates that combine them. The contract mirrors
  * [[ZoneMap.mergeManifests]]: `sketch(A ∪ B) == merge(sketch(A),
  * sketch(B))` at the STATE level — HLL union is a register-wise max,
  * CMS merge a counter-wise add. CMS estimates are therefore path-equal
  * exactly (spec-asserted); HLL ESTIMATES can differ by a hair between
  * a single-stream sketch (HIP estimator) and a union (composite
  * estimator), so the cross-path guarantee is the error envelope, with
  * exact path equality while sketches stay in sparse exact mode (the
  * spec regime). Either way an appended batch updates corpus-wide
  * statistics from its OWN sketch without rescanning history. At 100 TB this turns "distinct
  * users over the whole table after tonight's ingest" from a full-table
  * shuffle into a metadata-sized union over |batches| × |groups| rows.
  *
  * HLL rides Spark's built-in DataSketches functions (`hll_sketch_agg`,
  * `hll_union_agg`, `hll_sketch_estimate` — codegen'd aggregates,
  * nothing custom). CMS has a built-in SKETCH aggregate
  * (`count_min_sketch`) but no binary-merge aggregate, so the merge is
  * the one custom piece: an `Aggregator` over the serialized form using
  * the engine's own `CountMinSketch.mergeInPlace`.
  */
object Sketches {

  /** One HLL sketch (binary) + row count per group per batch — the
    * incremental statistics row an ingest appends. `lgK` is the
    * DataSketches log2(registers) accuracy knob (12 → ~1.6% rse).
    */
  def hllByGroup(batch: DataFrame, groupCol: String, valueCol: String,
                 lgK: Int = 12): DataFrame =
    batch.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"),
        count(lit(1)).as("n_rows"))

  /** Merge per-batch sketch rows back to one estimate row per group —
    * the union is over SKETCHES (register-wise max), so the input is
    * |batches| × |groups| rows of ~2^lgK bytes, never data.
    */
  def hllMergeByGroup(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("distinct_est"),
        sum(col("n_rows")).as("n_rows"))

  /** Binary-CMS merge aggregate: deserialize → `mergeInPlace` →
    * serialize. The buffer holds ONE live sketch per partial aggregate;
    * rows are sketch tables (per batch/partition), so the per-row
    * deserialize cost is bounded by batch count, not data size.
    */
  private class CmsMergeAgg
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def read(b: Array[Byte]) = CountMinSketch.readFrom(b)
    private def write(s: CountMinSketch): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      s.writeTo(out); out.toByteArray
    }
    override def zero: Array[Byte] = Array.empty
    override def reduce(acc: Array[Byte], row: Array[Byte]): Array[Byte] =
      merge(acc, row)
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else write(read(a).mergeInPlace(read(b)))
    override def finish(reduction: Array[Byte]): Array[Byte] = reduction
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** `cms_merge(col)` — aggregate a column of serialized CountMinSketch
    * binaries into their merged sketch.
    */
  def cmsMerge(c: Column): Column = udaf(new CmsMergeAgg).apply(c)

  /** Per-group CMS sketch column of `valueCol` for one batch. */
  def cmsByGroup(batch: DataFrame, groupCol: String, valueCol: String,
                 eps: Double = 0.001, confidence: Double = 0.99,
                 seed: Int = 42): DataFrame =
    batch.groupBy(col(groupCol))
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
        lit(seed)).as("cms"))

  /** Point-estimate lookup on a serialized CMS, driver-side (the sketch
    * is metadata-sized; per-key estimates are a driver concern).
    */
  def cmsEstimate(sketch: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(sketch).estimateCount(java.lang.Long.valueOf(item))

  /** Fixed-domain equi-width histogram sketch: per-group array of
    * `nBins` counts over `[lo, lo + nBins·width)`, out-of-range values
    * clamped into the edge bins. The quantile member of the mergeable
    * family (HLL distinct above, CMS frequency above, zone-map min/max
    * manifests): counts add element-wise, so `hist(A ∪ B) ==
    * merge(hist(A), hist(B))` EXACTLY — not within ε like HLL — and a
    * quantile read off the merged sketch has error bounded by one bin
    * width. One combinable pass per batch (`nBins` sum-whens, all
    * codegen'd); the sketch row is `nBins` longs, never data.
    */
  def histByGroup(batch: DataFrame, groupCol: String, valueCol: String,
                  lo: Double, width: Double, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    require(width > 0, s"width must be > 0, got $width")
    val bin = least(greatest(floor((col(valueCol) - lo) / width), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("int")
    val perBin = (0 until nBins).map(i =>
      sum(when(bin === i, 1L).otherwise(0L)).as(s"__b$i"))
    batch.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(perBin.head, perBin.tail: _*)
      .select(col(groupCol),
        array((0 until nBins).map(i => col(s"__b$i")): _*).as("hist"))
  }

  /** Element-wise sum of per-batch histogram sketches back to one row
    * per group. Input is |batches| × |groups| sketch rows; the explode
    * fans each out to `nBins` (pos, cnt) rows — still metadata-sized —
    * and both aggregates are combinable partials.
    */
  def histMergeByGroup(sketches: DataFrame, groupCol: String): DataFrame =
    sketches
      .select(col(groupCol), posexplode(col("hist")).as(Seq("pos", "cnt")))
      .groupBy(col(groupCol), col("pos")).agg(sum(col("cnt")).as("cnt"))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cnt")))),
        x => x.getField("cnt")).as("hist"))
}
