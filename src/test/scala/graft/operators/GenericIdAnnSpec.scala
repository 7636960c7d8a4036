package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Id-generic IVF search (r17): non-long id columns map onto a
  * deterministic xxhash64 i64 surrogate at build (`assigned.orig_id`
  * carries the original), the long-id core runs unchanged — INCLUDING the
  * replicated float/int8 orientations the old non-long-id gate skip
  * forbade — and the final projection decodes both id columns. The
  * contract pinned here: every orientation returns the same (query,
  * neighbor, cosine) sets on a string-id corpus, ivfSave/ivfLoad
  * round-trips the mapping, and mixed-id appends fail loud.
  */
class GenericIdAnnSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  // the long-id fixture re-keyed with string document ids
  private lazy val corpus: DataFrame =
    graft.Tables(spark, sf0001, "embeddings")
      .select(format_string("doc-%04d", col("vec_id")).as("vec_id"),
        col("embedding"))
  private lazy val queries: DataFrame = corpus.filter(col("vec_id") < "doc-0020")

  private def rows(df: DataFrame): Set[(String, String, Double, Int)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet

  test("string-id corpus: replicated float search is green and equals the distributed path") {
    val index = Similarity.ivfBuild(corpus, numCentroids = 4, trainIters = 1)
    assert(index.assigned.columns.contains("orig_id"),
      "generic build must keep the original ids alongside the surrogate")
    val replicated = withConf(
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      val df = Similarity.ivfSearch(index, queries, k = 5, nprobe = 4)
      assert(df.columns.toSeq == Seq("query_id", "neighbor_id", "cosine", "rk"))
      assert(df.schema("query_id").dataType ==
        org.apache.spark.sql.types.StringType, "ids must decode to the caller's type")
      rows(df)
    }
    assert(replicated.nonEmpty)
    assert(!replicated.exists(t => t._1 == t._2), "self-match leaked through")
    // the distributed orientations (maxBroadcastQueries = 0 pins the
    // no-broadcast shuffle plan) return identical rows — both paths run
    // on the same surrogates, so ranks and ties agree exactly
    val distributed = rows(Similarity.ivfSearch(index, queries, k = 5,
      nprobe = 4, maxBroadcastQueries = 0L))
    assert(distributed == replicated,
      s"distributed != replicated on string ids (|d|=${distributed.size}, " +
        s"|r|=${replicated.size})")
  }

  test("string-id corpus: the int8 regime (the old skip) is green, deterministic, exact-scored") {
    graft.functions.VectorFunctions.register(spark)
    val index = Similarity.ivfBuild(corpus, numCentroids = 2, trainIters = 1)
    val probe = withConf("spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      val r1 = rows(Similarity.ivfSearch(index, queries, k = 3, nprobe = 2))
      val r2 = rows(Similarity.ivfSearch(index, queries, k = 3, nprobe = 2))
      assert(r1 == r2, "int8 probe on string ids is not deterministic")
      r1
    }
    assert(probe.nonEmpty)
    // emitted scores are the exact float cosines (rerank), verified by
    // joining back through the STRING ids
    import spark.implicits._
    val probeDf = probe.toSeq.toDF("query_id", "neighbor_id", "cosine", "rk")
    val q = corpus.select(col("vec_id").as("query_id"), col("embedding").as("qa"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("qb"))
    val diff = probeDf.join(q, "query_id").join(c, "neighbor_id")
      .withColumn("ref", round(expr("cosine_sim(qa, qb)"), 4))
      .filter(col("cosine") =!= col("ref")).count()
    assert(diff == 0, "int8 probe on string ids emitted a non-exact cosine")
  }

  test("ivfSave/ivfLoad round-trips the surrogate mapping; appends keep it consistent") {
    val index = Similarity.ivfBuild(corpus, numCentroids = 4, trainIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-genid").toString
    Similarity.ivfSave(index, dir)
    val loaded = Similarity.ivfLoad(spark, dir)
    assert(loaded.assigned.columns.contains("orig_id"))
    val a = rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 4))
    val b = rows(Similarity.ivfSearch(loaded, queries, k = 5, nprobe = 4))
    assert(a == b, "loaded generic-id index diverged from the built one")
    // a long-id batch appended onto a generic index must fail loud
    val longBatch = graft.Tables(spark, sf0001, "embeddings")
      .filter(col("vec_id") < 5)
    val e = intercept[IllegalArgumentException](
      Similarity.ivfAppend(index, longBatch))
    assert(e.getMessage.contains("must match"))
    // a string-id batch appends cleanly and its twins are findable
    val batch = corpus.filter(col("vec_id") < "doc-0004")
      .select(concat(lit("new-"), col("vec_id")).as("vec_id"), col("embedding"))
    val appended = Similarity.ivfAppend(index, batch)
    val hits = rows(Similarity.ivfSearch(appended, queries, k = 5, nprobe = 4))
      .map(t => (t._1, t._2))
    (0 until 4).foreach { i =>
      val qid = f"doc-$i%04d"
      assert(hits.contains((qid, s"new-$qid")),
        s"appended twin of $qid not found: ${hits.filter(_._1 == qid)}")
    }
  }

  test("a string-id query batch against a long-id index fails with a buildable message") {
    val longIndex = Similarity.ivfBuild(
      graft.Tables(spark, sf0001, "embeddings"), numCentroids = 2, trainIters = 0)
    val e = intercept[IllegalArgumentException](
      Similarity.ivfSearch(longIndex, queries, k = 3, nprobe = 2))
    assert(e.getMessage.contains("orig_id") || e.getMessage.contains("id type"),
      s"mismatch must explain the fix, got: ${e.getMessage}")
  }
}
