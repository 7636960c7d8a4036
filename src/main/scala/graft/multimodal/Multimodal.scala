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

  /** REAL container-header metadata decode — no codec library needed.
    * JPEG/PNG/GIF dimensions and channel counts live in the container
    * headers as plain big/little-endian integers, so format sniffing and
    * geometry extraction are pure byte arithmetic:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is mandated first —
    *    width/height are the two big-endian u32s at offsets 16/20, and
    *    the color type at 25 determines channels (spec: RFC 2083 §4.1.1).
    *  - GIF: "GIF87a"/"GIF89a", logical-screen width/height as
    *    little-endian u16 at offsets 6/8.
    *  - JPEG: walk the FF-marker stream from SOI; any frame-header
    *    marker SOFn (0xC0–0xCF minus DHT 0xC4 / JPG 0xC8 / DAC 0xCC)
    *    carries u16 height/width at segment offsets 3/5 and the
    *    component count (channels) at 7. Standalone markers (RSTn, TEM)
    *    have no length field; every other segment starts with its u16
    *    length, so the walk is O(#segments), not O(bytes).
    *
    * Defensive by construction: any malformed/truncated/garbage payload
    * yields (-1, -1, -1, format-or-"unknown") instead of throwing — at
    * 100 TB a poison blob must quarantine (filterable `width = -1`), not
    * kill the stage. Fuzz-gated in MultimodalSpec (random byte arrays
    * never throw). Pixel DECODE (the DCT/inflate) remains behind the
    * [[decodeMeta]] seam — that part is genuinely codec-bound; metadata
    * extraction is not, and this replaces the stub for it.
    */
  private[multimodal] def sniffMeta(id: Long, b: Array[Byte]): MediaMeta = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def u16be(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val len = b.length
    if (len >= 26 && u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4E &&
        u8(3) == 0x47 && u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A &&
        u8(7) == 0x0A && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = (u8(16) << 24) | (u8(17) << 16) | (u8(18) << 8) | u8(19)
      val h = (u8(20) << 24) | (u8(21) << 16) | (u8(22) << 8) | u8(23)
      val channels = u8(25) match {
        case 0 => 1 case 2 => 3 case 3 => 1 case 4 => 2 case 6 => 4 case _ => -1
      }
      if (w > 0 && h > 0) MediaMeta(id, len, w, h, channels, "png")
      else MediaMeta(id, len, -1, -1, -1, "png")
    } else if (len >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      MediaMeta(id, len, u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8), 3, "gif")
    } else if (len >= 2 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      var out: MediaMeta = null
      while (out == null && i + 1 < len) {
        if (u8(i) != 0xFF) i += 1 // fill bytes / resync
        else {
          val m = u8(i + 1)
          if (m == 0xFF) i += 1 // marker padding
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) i += 2 // standalone
          else if (m == 0xD9 || m == 0xDA) { // EOI / SOS before any SOF
            out = MediaMeta(id, len, -1, -1, -1, "jpeg")
          } else if (i + 3 < len) {
            val segLen = u16be(i + 2)
            val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
            if (isSof && segLen >= 8 && i + 9 < len) {
              out = MediaMeta(id, len, u16be(i + 7), u16be(i + 5), u8(i + 9), "jpeg")
            } else if (segLen < 2) { // malformed length: cannot advance
              out = MediaMeta(id, len, -1, -1, -1, "jpeg")
            } else i += 2 + segLen
          } else out = MediaMeta(id, len, -1, -1, -1, "jpeg")
        }
      }
      if (out == null) MediaMeta(id, len, -1, -1, -1, "jpeg") else out
    } else MediaMeta(id, len, -1, -1, -1, "unknown")
  }

  /** [[sniffMeta]] with the same partition-wise streamed shape as
    * [[decodeMeta]] — the production metadata path for real media blobs.
    */
  def decodeSniffedMeta(spark: SparkSession, binDf: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    binDf.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => sniffMeta(id, bytes) })
  }

  /** Audio/video stream metadata, from container headers like
    * [[sniffMeta]] — sample geometry for audio, timescale/duration for
    * video. `durationMs = -1` when the container carries no duration.
    */
  case class AvMeta(id: Long, byteLen: Int, format: String, channels: Int,
                    sampleRate: Int, bitsPerSample: Int, durationMs: Long)

  private def avUnknown(id: Long, len: Int, fmt: String = "unknown") =
    AvMeta(id, len, fmt, -1, -1, -1, -1L)

  /** WAV (RIFF) + MP4 (ISO BMFF) metadata — pure byte arithmetic:
    *
    *  - WAV: "RIFF"<u32le size>"WAVE", then a chunk walk; the "fmt "
    *    chunk carries channels/sampleRate/bitsPerSample (little-endian),
    *    the "data" chunk length + that geometry gives the duration.
    *  - MP4: a box walk ([u32be size][4cc], size 1 = u64 largesize) to
    *    `moov`, then its child `mvhd` — timescale and duration at
    *    version-dependent offsets (v0: u32 each after 4+4+4 header
    *    fields; v1: u64 times, u32 timescale).
    *
    * Same quarantine contract as [[sniffMeta]]: malformed input yields
    * -1 fields, never an exception (shared fuzz gate in the spec).
    */
  private[multimodal] def sniffAv(id: Long, b: Array[Byte]): AvMeta = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def u32le(i: Int): Long = u16le(i).toLong | (u16le(i + 2).toLong << 16)
    @inline def u32be(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def fourcc(i: Int): String = new String(b, i, 4, "ASCII")
    val len = b.length
    if (len >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var channels, rate, bits = -1
      var dataLen = -1L
      while (i + 8 <= len && (channels < 0 || dataLen < 0)) {
        val ck = fourcc(i); val ckLen = u32le(i + 4)
        if (ck == "fmt " && ckLen >= 16 && i + 8 + 16 <= len) {
          channels = u16le(i + 10); rate = u32le(i + 12).toInt; bits = u16le(i + 22)
        } else if (ck == "data") dataLen = ckLen
        // chunks are word-aligned: odd lengths carry a pad byte
        if (ckLen < 0 || ckLen > len) i = len else i += 8 + ckLen.toInt + (ckLen.toInt & 1)
      }
      val durMs =
        if (channels > 0 && rate > 0 && bits > 0 && dataLen >= 0)
          dataLen * 1000L / (rate.toLong * channels * (bits / 8).max(1))
        else -1L
      AvMeta(id, len, "wav", channels, rate, bits, durMs)
    } else if (len >= 12 && fourcc(4) == "ftyp") {
      // top-level box walk to moov, then child walk to mvhd
      def findBox(name: String, from: Int, to: Int): Int = {
        var i = from
        while (i + 8 <= to) {
          val size = u32be(i)
          if (fourcc(i + 4) == name) return i
          if (size < 8) return -1 // size 0/1 (to-eof / largesize): bail conservatively
          i += size.toInt
        }
        -1
      }
      val moov = findBox("moov", 0, len)
      if (moov < 0) avUnknown(id, len, "mp4")
      else {
        val moovEnd = math.min(len.toLong, moov + u32be(moov)).toInt
        val mvhd = findBox("mvhd", moov + 8, moovEnd)
        if (mvhd < 0 || mvhd + 12 > len) avUnknown(id, len, "mp4")
        else {
          val ver = u8(mvhd + 8)
          val (timescale, duration) =
            if (ver == 1 && mvhd + 40 <= len)
              (u32be(mvhd + 28),
                (u32be(mvhd + 32) << 32) | u32be(mvhd + 36))
            else if (ver == 0 && mvhd + 28 <= len)
              (u32be(mvhd + 20), u32be(mvhd + 24))
            else (-1L, -1L)
          val durMs = if (timescale > 0 && duration >= 0) duration * 1000L / timescale else -1L
          AvMeta(id, len, "mp4", -1, -1, -1, durMs)
        }
      }
    } else avUnknown(id, len)
  }

  /** [[sniffAv]] with the partition-wise streamed decode shape. */
  def decodeAvMeta(spark: SparkSession, binDf: DataFrame): Dataset[AvMeta] = {
    import spark.implicits._
    binDf.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => sniffAv(id, bytes) })
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
