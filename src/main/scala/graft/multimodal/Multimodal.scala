package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side architecture is real and tested — schema, partition-wise
  * batch decode shape, deterministic outputs. The actual codec call is a
  * STUB (`fakeDecode`): this container has no image/audio libraries, so the
  * decode is a deterministic function of the bytes. In production the
  * `mapPartitions` body below is where a JNI/libjpeg (Scala) or
  * `mapInPandas` + PIL (Python) decoder plugs in; everything around it —
  * per-partition decoder init, batched iteration, typed output — is the
  * shape that scales: decode is embarrassingly parallel, no shuffle, and
  * the binary column never leaves the executor that read it.
  */
object Multimodal {

  case class MediaMeta(id: Long, byteLen: Int, width: Int, height: Int,
                       channels: Int, format: String)

  /** Attach a binary payload column (UTF-8 bytes of a string column here;
    * in production this is the raw image/audio blob column from parquet).
    */
  def withBinaryPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), col(srcCol).cast("binary").as("payload"))

  /** STUB decoder — deterministic fake metadata derived from the bytes.
    * Replace the body with a real codec (e.g. javax.imageio / ffmpeg JNI)
    * without touching the surrounding plumbing.
    */
  private[multimodal] def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length
    val w = 64 + (len % 512)
    val h = 64 + ((len / 7) % 512)
    val fmt = if (len % 2 == 0) "png" else "jpeg"
    MediaMeta(id, len, w, h, 3, fmt)
  }

  /** Partition-wise batch decode: one decoder per partition, streamed
    * iterator (never materializes the partition), typed Dataset out.
    */
  def decodeMeta(spark: SparkSession, binDf: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    binDf.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // production: initialize the native decoder once per partition here
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Columnar metadata variant (no mapPartitions): byte length and the same
    * deterministic derivations as pure expressions — stays in codegen and
    * is oracle-checkable. Production keeps cheap fields columnar like this
    * and reserves the decode path for fields that need the codec.
    */
  def metaColumns(binDf: DataFrame): DataFrame =
    binDf.select(
      col("id"),
      octet_length(col("payload")).cast("int").as("byte_len"),
      (lit(64) + octet_length(col("payload")) % 512).cast("int").as("width"),
      (lit(64) + floor(octet_length(col("payload")) / 7).cast("int") % 512).cast("int").as("height"),
      when(octet_length(col("payload")) % 2 === 0, "png").otherwise("jpeg").as("format"))

  /** Frame-sampling plumbing for video-like payloads: explode evenly spaced
    * frame offsets (every `everyNBytes`) — the partition/batch shape of a
    * real frame sampler, with byte offsets standing in for frame indexes.
    */
  def sampleFrames(binDf: DataFrame, everyNBytes: Int = 100): DataFrame =
    binDf.select(
      col("id"),
      posexplode(sequence(lit(0),
        greatest(octet_length(col("payload")).cast("int") - 1, lit(0)),
        lit(everyNBytes))).as(Seq("frame_no", "byte_offset")))

  case class MediaFeatures(id: Long, embedding: Array[Float])

  /** Feature extraction over the binary payload: a normalized byte-value
    * histogram — NOT a stub; a real, codec-free content feature (the same
    * shape a CLIP/audio embedding would have). Output column is named
    * `embedding` so it feeds [[graft.operators.Similarity]] directly:
    * binary → features → dedup/ANN is the full multimodal pipeline loop.
    * Same partition-wise seam as [[decodeMeta]]: swap the histogram for a
    * model forward pass without touching the plumbing.
    */
  def byteHistogram(spark: SparkSession, binDf: DataFrame, bins: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    binDf.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // production: load the feature model once per partition here
        it.map { case (id, bytes) =>
          val h = new Array[Float](bins)
          var i = 0
          while (i < bytes.length) {
            h(((bytes(i) & 0xFF) * bins) / 256) += 1f
            i += 1
          }
          val n = math.max(bytes.length, 1).toFloat
          var j = 0
          while (j < bins) { h(j) /= n; j += 1 }
          MediaFeatures(id, h)
        }
      }
  }

  /** Resize plumbing: target geometry + scale factors as pure columns over
    * the decoded metadata (from [[metaColumns]]). The pixel resample itself
    * is codec-bound and lives behind the [[decodeMeta]] seam; everything a
    * planner needs — output geometry, scale, whether work is needed — is
    * columnar and codegen'd.
    */
  def resizePlan(metaDf: DataFrame, targetW: Int, targetH: Int): DataFrame =
    metaDf.select(
      col("id"), col("width"), col("height"),
      lit(targetW).as("target_w"), lit(targetH).as("target_h"),
      round(lit(targetW) / col("width").cast("double"), 4).as("scale_x"),
      round(lit(targetH) / col("height").cast("double"), 4).as("scale_y"),
      (col("width") =!= targetW || col("height") =!= targetH).as("needs_resize"))
}
