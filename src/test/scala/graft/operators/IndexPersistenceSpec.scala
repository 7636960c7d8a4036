package graft.operators

import graft.SparkSpec

class IndexPersistenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val rnd = new scala.util.Random(29)
    (0 until 300).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }
  private lazy val queries = corpus.filter($"vec_id" < 4)

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-idx-$tag").toString

  test("ivfSave/ivfLoad round-trips: loaded index searches identically") {
    val built = Similarity.ivfBuild(corpus, numCentroids = 8)
    val dir = tmp("ivf")
    Similarity.ivfSave(built, dir)
    val loaded = Similarity.ivfLoad(spark, dir)
    assert(loaded.centroids.map(_._1) == built.centroids.map(_._1))
    val a = Similarity.ivfSearch(built, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = Similarity.ivfSearch(loaded, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b)
    // the on-disk layout is one directory per inverted list — the probe
    // join can physically skip unprobed lists
    val dirs = new java.io.File(s"$dir/assigned").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("list_id="))
    assert(dirs.length == built.centroids.length,
      s"expected one partition dir per list, got ${dirs.toSeq}")
  }

  test("ivfPqSave/ivfPqLoad round-trips codebooks and codes exactly") {
    val built = Similarity.ivfPqBuild(corpus, numCentroids = 8, m = 8, ksub = 16)
    val dir = tmp("ivfpq")
    Similarity.ivfPqSave(built, dir)
    val loaded = Similarity.ivfPqLoad(spark, dir)
    assert(loaded.dim == built.dim && loaded.m == built.m)
    assert(loaded.codebooks.flatten.flatten.toSeq == built.codebooks.flatten.flatten.toSeq)
    val a = Similarity.ivfPqSearch(built, corpus, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = Similarity.ivfPqSearch(loaded, corpus, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b)
  }
}
