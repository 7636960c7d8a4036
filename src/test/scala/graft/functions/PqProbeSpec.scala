package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PQ/ADC-scored replicated probe (spark.graft.ann.probePq): the
  * index's resident copy shrinks to `pqM` code bytes per vector + a
  * driver-small shared codebook, and candidate scoring is m LUT adds.
  * Like the int8 regime, the ADC scan only SELECTS a shortlist — an
  * in-operator float rerank makes every emitted score (and the
  * `minCosine` filter) exact. Pinned here:
  *
  *   - Opt-in: the conf default leaves the float/int8 regimes in charge.
  *   - Same output contract (schema, rank 1..k, self-exclusion),
  *     deterministic across runs (no RNG anywhere: hash-stride training
  *     sample, farthest-first seeding).
  *   - Emitted scores are EXACT float cosines.
  *   - With the shortlist overfetch covering the whole corpus, the PQ
  *     path EQUALS the float path — ADC quality moves recall only.
  *   - Shortlist recall vs the float top-k is gated (looser than int8's:
  *     ADC reconstruction error is coarser; the honest number at scale
  *     lands in PLANS.md).
  */
class PqProbeSpec extends SparkSpec {

  private def emb: DataFrame = graft.Tables(spark, sf0001, "embeddings")

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("pq probe: contract, deterministic, self-excluded, exact scores") {
    VectorFunctions.register(spark)
    val index = Similarity.ivfBuild(emb, numCentroids = 4, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 40)
    withConf("spark.graft.ann.probePq" -> "true",
             "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      val a = Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None)
      assert(a.columns.toSeq == Seq("query_id", "neighbor_id", "cosine", "rk"))
      val r1 = rows(a)
      val r2 = rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None))
      assert(r1 == r2, "pq probe is not deterministic")
      assert(r1.nonEmpty)
      assert(!r1.exists(t => t._1 == t._2), "self-match leaked through")
      r1.groupBy(_._1).foreach { case (_, ts) =>
        assert(ts.map(_._4).toSeq.sorted == (1 to ts.size).toSeq)
      }
      // every emitted cosine is the exact float cosine_sim of the pair
      val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("qa"))
      val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("qb"))
      val diff = a.join(q, "query_id").join(c, "neighbor_id")
        .withColumn("ref", round(expr("cosine_sim(qa, qb)"), 4))
        .filter(col("cosine") =!= col("ref"))
        .count()
      assert(diff == 0, "pq probe emitted a non-exact cosine (rerank missing?)")
    }
  }

  test("pq probe at nprobe=all with a corpus-wide shortlist equals the float path") {
    val index = Similarity.ivfBuild(emb, numCentroids = 2, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 30)
    val n = emb.count().toInt
    val float = withConf(
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 2, minCosine = None))
    }
    val pq = withConf("spark.graft.ann.probePq" -> "true",
      "spark.graft.ann.rerankFactor" -> n.toString,
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 2, minCosine = None))
    }
    assert(pq == float,
      s"corpus-wide-shortlist pq != float (|pq|=${pq.size}, |float|=${float.size})")
  }

  test("pq shortlist recalls >= 0.6 of the float top-k (ADC quality gate)") {
    val index = Similarity.ivfBuild(emb, numCentroids = 4, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 60)
    val float = withConf(
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None))
        .map(t => (t._1, t._2))
    }
    val pq = withConf("spark.graft.ann.probePq" -> "true",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None))
        .map(t => (t._1, t._2))
    }
    val recall = float.count(pq.contains).toDouble / float.size
    assert(recall >= 0.6, f"pq shortlist recall $recall%.3f < 0.6 " +
      s"(|float|=${float.size}, |pq|=${pq.size})")
  }

  test("pq replicates at the code width where even int8 cannot") {
    val index = Similarity.ivfBuild(emb, numCentroids = 4, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 10)
    val dim = 64
    val vecWidth = dim.toLong * 4 + 24
    val i8Width = dim.toLong + 40
    val pqWidth = 8L + 40
    // the same honest estimate the gate itself acts on (r17: footer row
    // counts, not compressed sizeInBytes / decoded width)
    val rows0 = Similarity.estRowsHonest(index.assigned, vecWidth)._1
    // a budget BETWEEN the pq and int8 resident estimates
    val budget = ((rows0 * pqWidth + rows0 * i8Width) / 2).toString
    def planOf(confs: (String, String)*): String = withConf(
      (confs :+ ("spark.graft.ann.replicateIndexBytes" -> budget)): _*) {
      val df = Similarity.ivfSearch(index, queries, k = 3, nprobe = 2, minCosine = None)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val int8 = planOf("spark.graft.ann.probeInt8" -> "true")
    assert(int8.contains("ivf_block_topk") || int8.contains("block_cross_topk"),
      "int8 copy over this budget should land distributed")
    val pq = planOf("spark.graft.ann.probePq" -> "true")
    assert(!pq.contains("ivf_block_topk") && !pq.contains("block_cross_topk"),
      "pq code copy fits the same budget and must replicate")
  }

  test("pq conf validation: probePq strict parse, pqM divisibility, ksub bounds") {
    assert(!graft.GraftConf.annProbePq(spark))
    withConf("spark.graft.ann.probePq" -> "yes") {
      val e = intercept[IllegalArgumentException](graft.GraftConf.annProbePq(spark))
      assert(e.getMessage.contains("spark.graft.ann.probePq"))
    }
    withConf("spark.graft.ann.pqKsub" -> "300") {
      val e = intercept[IllegalArgumentException](graft.GraftConf.annPqKsub(spark))
      assert(e.getMessage.contains("pqKsub"))
    }
    // dim 64 does not split into 7 subspaces — the operator must say so
    val index = Similarity.ivfBuild(emb, numCentroids = 2, trainIters = 1)
    withConf("spark.graft.ann.probePq" -> "true",
      "spark.graft.ann.pqM" -> "7",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfSearch(index, emb.limit(5), k = 3, nprobe = 2,
          minCosine = None).collect()
      }
      assert(e.getMessage.contains("not divisible"))
    }
  }
}
