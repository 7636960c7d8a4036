package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Disk-lazy in-kernel exact rerank of the int8 replicated probe (r18):
  * ivfSavePacked writes a raw-byte blob sidecar + offset index
  * ([[BlobStore]]); a loaded artifact's int8 probe rescores its own
  * shortlist by positioned-reading the winners' float blobs through a
  * per-executor LRU instead of joining corpus floats onto the shortlist.
  * Pinned here: sidecar byte-coverage, bit-equality against the
  * join-form rerank (scores, floor, ties, rounding, ranks), end-to-end
  * equality with the float path at nprobe=all, LRU hit/miss behavior
  * under a byte budget, and append coherence.
  */
class DiskLazyRerankSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private lazy val corpus: DataFrame =
    graft.Tables(spark, sf0001, "embeddings")
  private lazy val queries: DataFrame = corpus.filter(col("vec_id") < 30)

  private def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  private def savedIndex(): (Similarity.IvfIndex, String) = {
    val index = Similarity.ivfBuild(corpus, numCentroids = 4, trainIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-disklazy").toString
    Similarity.ivfSavePacked(index, dir)
    (Similarity.ivfLoad(spark, dir), dir)
  }

  test("ivfSavePacked writes a blob sidecar whose index covers every packed chunk byte-for-byte") {
    val (loaded, dir) = savedIndex()
    assert(loaded.blobs.nonEmpty, "loaded artifact must attach the sidecar index")
    val idx = loaded.blobs.get
    val packed = spark.read.parquet(s"$dir/packed")
    assert(idx.count() == packed.count(),
      "one sidecar index row per packed chunk")
    val idxLen = idx.agg(sum(col("length"))).head().getLong(0)
    val blobLen = packed.select(sum(length(col("block")))).head().getLong(0)
    assert(idxLen == blobLen, s"sidecar bytes $idxLen != packed blob bytes $blobLen")
    // every referenced blob decodes, and its ids ascend (binary-search contract)
    BlobStore.collectIndexRows(idx).foreach { case (_, path, off, len) =>
      val blk = BlobStore.readBlob(path, off, len)
      assert(blk.n > 0)
      (1 until blk.n).foreach(i => assert(blk.ids(i - 1) < blk.ids(i),
        "blob ids must ascend"))
    }
  }

  test("disk-lazy rerank is bit-equal to the join-form rerank (floor, ties, rounding, ranks)") {
    val (loaded, _) = savedIndex()
    def run(diskLazy: Boolean): Set[(Long, Long, Double, Int)] = withConf(
      "spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString,
      "spark.graft.ann.rerankDiskLazy" -> diskLazy.toString) {
      rows(Similarity.ivfSearch(loaded, queries, k = 5, nprobe = 3,
        minCosine = Some(0.1)))
    }
    val (lazyRes, logs) = graft.LogCapture("graft.operators.Similarity") {
      run(diskLazy = true)
    }
    assert(logs.exists(_.contains("DISK-LAZY")),
      s"gate decision must log, got: ${logs.filter(_.contains("ivf"))}")
    val joinRes = run(diskLazy = false)
    assert(lazyRes.nonEmpty)
    assert(lazyRes == joinRes,
      s"disk-lazy != join-form: only-lazy=${lazyRes -- joinRes} " +
        s"only-join=${joinRes -- lazyRes}")
  }

  test("disk-lazy int8 equals the float path end-to-end at nprobe=all") {
    val (loaded, _) = savedIndex()
    val base = Seq(
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString,
      "spark.graft.ann.rerankDiskLazy" -> "true",
      "spark.graft.ann.rerankFactor" -> "1000")
    val lazyRes = withConf(base :+
        ("spark.graft.ann.probeInt8" -> "true"): _*) {
      rows(Similarity.ivfSearch(loaded, queries, k = 5, nprobe = 4,
        minCosine = Some(0.1)))
    }
    val floatRes = withConf(base :+
        ("spark.graft.ann.probeInt8" -> "false"): _*) {
      rows(Similarity.ivfSearch(loaded, queries, k = 5, nprobe = 4,
        minCosine = Some(0.1)))
    }
    assert(lazyRes == floatRes,
      s"disk-lazy int8 != float at nprobe=all: only-i8=${lazyRes -- floatRes} " +
        s"only-float=${floatRes -- lazyRes}")
  }

  test("the blob LRU misses cold, hits warm, and stays correct under a starved budget") {
    val (loaded, _) = savedIndex()
    def search() = withConf(
      "spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.rerankDiskLazy" -> "true",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(loaded, queries, k = 5, nprobe = 3))
    }
    BlobStore.BlobCache.clear()
    val first = search()
    val missesCold = BlobStore.BlobCache.misses.get()
    assert(missesCold > 0, "cold search must read blobs")
    val second = search()
    assert(second == first)
    assert(BlobStore.BlobCache.hits.get() > 0,
      "warm search must hit the cache")
    // a budget smaller than any blob: everything re-reads, results identical
    val starved = withConf(
      "spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.rerankDiskLazy" -> "true",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString,
      "spark.graft.ann.blobCacheBytes" -> "1") {
      rows(Similarity.ivfSearch(loaded, queries, k = 5, nprobe = 3))
    }
    assert(starved == first, "budget starvation must not change results")
  }

  test("ivfAppendToSaved keeps the sidecar coherent: appended twins rerank exactly") {
    val (_, dir) = savedIndex()
    val batch = corpus.filter(col("vec_id") < 3)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    Similarity.ivfAppendToSaved(spark, dir, batch)
    val reloaded = Similarity.ivfLoad(spark, dir)
    val res = withConf(
      "spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.rerankDiskLazy" -> "true",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      val (r, logs) = graft.LogCapture("graft.operators.Similarity") {
        rows(Similarity.ivfSearch(reloaded, queries, k = 5, nprobe = 4))
      }
      assert(logs.exists(_.contains("DISK-LAZY")),
        "append must keep the disk-lazy path available")
      r
    }
    (0L until 3L).foreach { i =>
      val hit = res.find(t => t._1 == i && t._2 == i + 100000L)
      assert(hit.nonEmpty, s"appended twin of $i not found via disk-lazy rerank")
      assert(hit.get._3 == 1.0, s"twin cosine must be exactly 1.0, got ${hit.get._3}")
    }
  }
}
