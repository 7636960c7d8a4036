package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Raw-byte sidecar of a packed IVF artifact, for the DISK-LAZY exact
  * rerank (PLANS.md round-17 design, round-18 implementation): the
  * packed chunk blobs are laid out back-to-back in a handful of `.bin`
  * files with a tiny parquet index of (list_id, chunk) → (path, offset,
  * length), so a probe task can fetch exactly the blobs that hold its
  * shortlist members with one positioned read each — replacing the
  * join-form rerank's corpus_vec-per-shortlist-row exchange (~28 GB at
  * the 1M-queries-=-corpus sf20 shape) with re-reads of a bounded blob
  * set through the executor page cache and an in-heap LRU.
  *
  * Layout notes for object stores / task retries: each writer names its
  * file by (partition, taskAttemptId), so a retried or speculated task
  * writes a FRESH file and emits index rows that reference it — the
  * attempt whose index rows commit is the attempt whose file is read;
  * losing attempts leave small orphan files that nothing references.
  * The positioned read (`FSDataInputStream.readFully(pos, ...)`) is the
  * HDFS/S3A ranged-GET primitive, so the same layout works off local
  * disk, HDFS, or an object store.
  */
object BlobStore {

  /** Write the blob sidecar under `dir` (one action: the index write
    * drives the `.bin` writes). `packed` must carry (list_id, chunk,
    * block) and SHOULD be aligned one-partition-per-list-group
    * (ivfSavePacked passes its aligned layout) so a list's blobs land
    * contiguously in one file — the locality the LRU leans on.
    */
  def write(packed: DataFrame, dir: String): Unit =
    writeImpl(packed, dir, "overwrite")

  /** Append a new batch's blobs (ivfAppendToSaved): fresh `.bin` files +
    * appended index rows; existing files are never rewritten, so the
    * write cost is the batch.
    */
  def append(packed: DataFrame, dir: String): Unit =
    writeImpl(packed, dir, "append")

  private def writeImpl(packed: DataFrame, dir: String, mode: String): Unit = {
    val idxSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("list_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("chunk",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("offset",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.IntegerType)))
    val index = packed.select(col("list_id").cast("long"),
        col("chunk").cast("int"), col("block"))
      .mapPartitions { it: Iterator[Row] =>
        if (!it.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          // UUID-salted name: unique across task retries AND sessions
          // (appends reuse the directory), so no attempt ever rewrites a
          // file another attempt's committed index rows reference
          val path = s"$dir/part-${tc.partitionId()}-" +
            s"${java.util.UUID.randomUUID().toString.take(8)}.bin"
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          val out = fs.create(p, true)
          val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
          var off = 0L
          try {
            while (it.hasNext) {
              val r = it.next()
              val blob = r.getAs[Array[Byte]](2)
              out.write(blob)
              rows += Row(r.getLong(0), r.getInt(1), path, off, blob.length)
              off += blob.length
            }
          } finally out.close()
          rows.iterator
        }
      }(org.apache.spark.sql.Encoders.row(idxSchema))
    index.write.mode(mode).parquet(s"$dir/index")
  }

  /** The sidecar's index, or None when `dir` has none (pre-r18
    * artifacts, plain ivfSave layouts). Driver-small: one row per
    * (list, chunk) blob.
    */
  def loadIndex(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/index")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(s"$dir/index")) else None
  }

  /** Index rows collected for broadcast, ordinal-addressed: the probe
    * keys winner blobs by POSITION in this array (chunk ids can repeat
    * across appends, so (list, chunk) is not a key; an ordinal is unique
    * by construction). Order is arbitrary but fixed per collect — the
    * quantized broadcast and the ref broadcast are built from the SAME
    * array within one search call.
    */
  def collectIndexRows(index: DataFrame): Array[(Long, String, Long, Int)] =
    index.select(col("list_id"), col("path"), col("offset"), col("length"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))

  /** Driver-side positioned read + decode, uncached (the quantize pass
    * streams every blob exactly once).
    */
  def readBlob(path: String, offset: Long,
               length: Int): VectorFunctions.DecodedBlock =
    BlobCache.readAndDecode(path, offset, length)

  /** Executor-resident bounded LRU of DECODED float blocks, shared by
    * every task in the JVM (keyed by (path, offset), so distinct
    * artifacts never alias). Charging uses the decoded footprint (ids +
    * floats + norm doubles). Fetches outside the map lock would re-read
    * a hot blob under contention; since a decode is ~ms and the map op
    * ~ns, the fetch runs UNDER a per-key latch instead: first requester
    * decodes, the rest wait on the latch — no duplicate reads, no
    * whole-cache stall (the global lock covers only map bookkeeping).
    */
  object BlobCache {
    private final class Entry(@volatile var blk: VectorFunctions.DecodedBlock,
                              val latch: java.util.concurrent.CountDownLatch)
    private val lock = new Object
    private val map = new java.util.LinkedHashMap[(String, Long), Entry](256, 0.75f, true)
    private var charged = 0L
    // test/measurement counters (monotone, JVM-local)
    val hits = new java.util.concurrent.atomic.AtomicLong(0L)
    val misses = new java.util.concurrent.atomic.AtomicLong(0L)

    private def footprint(b: VectorFunctions.DecodedBlock): Long =
      b.n.toLong * (8L + 8L) + b.vecs.length.toLong * 4L + 64L

    /** Positioned read + decode, through the LRU. `budget` bounds the
      * total decoded bytes resident (evicting least-recently-used); a
      * single blob larger than the budget is returned uncached.
      */
    def get(path: String, offset: Long, length: Int,
            budget: Long): VectorFunctions.DecodedBlock = {
      val key = (path, offset)
      var mine: Entry = null
      val e = lock.synchronized {
        val cur = map.get(key)
        if (cur != null) { hits.incrementAndGet(); cur }
        else {
          misses.incrementAndGet()
          mine = new Entry(null, new java.util.concurrent.CountDownLatch(1))
          map.put(key, mine)
          mine
        }
      }
      if (mine == null) {
        // someone else is (or was) loading it
        e.latch.await()
        val b = e.blk
        if (b != null) return b
        // loader failed — fall through to a direct uncached read
        return readAndDecode(path, offset, length)
      }
      try {
        val blk = readAndDecode(path, offset, length)
        mine.blk = blk
        lock.synchronized {
          charged += footprint(blk)
          if (footprint(blk) > budget) { map.remove(key); charged -= footprint(blk) }
          else {
            val it = map.entrySet().iterator()
            while (charged > budget && it.hasNext) {
              val old = it.next()
              // skip self and still-loading entries (uncharged, blk null)
              if ((old.getValue ne mine) && old.getValue.blk != null) {
                charged -= footprint(old.getValue.blk)
                it.remove()
              }
            }
          }
        }
        blk
      } catch {
        case t: Throwable =>
          lock.synchronized { map.remove(key) }
          throw t
      } finally mine.latch.countDown()
    }

    private[BlobStore] def readAndDecode(path: String, offset: Long,
                              length: Int): VectorFunctions.DecodedBlock = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val in = fs.open(p)
      val buf = new Array[Byte](length)
      try in.readFully(offset, buf, 0, length) finally in.close()
      VectorFunctions.decodeBlock(buf)
    }

    /** Test hook: drop everything and reset counters. */
    def clear(): Unit = lock.synchronized {
      map.clear(); charged = 0L; hits.set(0L); misses.set(0L)
    }
  }
}
