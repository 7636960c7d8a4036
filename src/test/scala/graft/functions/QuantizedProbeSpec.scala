package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The int8-scored replicated probe (spark.graft.ann.probeInt8): the
  * optional scalar-quantizer index copy — 4× smaller resident arrays,
  * 16-lane integer SIMD dots, scores within quantization error of the
  * float path. Contracts pinned here:
  *
  *   - OFF by default: with the conf unset the probe is the float path
  *     (the orientation-equality specs already pin that bit-identically).
  *   - Same output contract (schema, rank 1..k, self-exclusion).
  *   - Deterministic: two int8 runs return identical rows.
  *   - Quantization error is bounded IN EFFECT: nprobe=all int8 top-k
  *     recalls ≥ 0.8 of the float top-k per query on the real fixture
  *     (the deployment shape reranks the shortlist exactly downstream,
  *     so shortlist-level recall is the quantity that matters).
  *   - The probe's quantizer IS the quantize_i8 expression's math: the
  *     kernel scores agree with cosine_sim_i8 over quantize_i8 columns.
  */
class QuantizedProbeSpec extends SparkSpec {

  private def emb: DataFrame = graft.Tables(spark, sf0001, "embeddings")

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def rows(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("int8 probe: same contract, deterministic, self-excluded") {
    val index = Similarity.ivfBuild(emb, numCentroids = 4, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 40)
    withConf("spark.graft.ann.probeInt8" -> "true",
             "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      val a = Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None)
      assert(a.columns.toSeq == Seq("query_id", "neighbor_id", "cosine", "rk"))
      val r1 = rows(a)
      val r2 = rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None))
      assert(r1 == r2, "int8 probe is not deterministic")
      assert(r1.nonEmpty)
      assert(!r1.exists(t => t._1 == t._2), "self-match leaked through")
      // ranks are 1..size per query, ordered by (cosine desc, id asc)
      val byQ = r1.groupBy(_._1)
      byQ.foreach { case (_, ts) =>
        assert(ts.map(_._4).toSeq.sorted == (1 to ts.size).toSeq)
      }
    }
  }

  test("int8 probe recalls >= 0.8 of the float top-k at nprobe=all (shortlist quality)") {
    val index = Similarity.ivfBuild(emb, numCentroids = 4, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 60)
    val float = withConf(
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None))
        .map(t => (t._1, t._2))
    }
    val int8 = withConf("spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None))
        .map(t => (t._1, t._2))
    }
    val recall = float.count(int8.contains).toDouble / float.size
    assert(recall >= 0.8, f"int8 shortlist recall $recall%.3f < 0.8 " +
      s"(|float|=${float.size}, |int8|=${int8.size})")
  }

  test("kernel scores agree with cosine_sim_i8 over quantize_i8 columns") {
    VectorFunctions.register(spark)
    val index = Similarity.ivfBuild(emb, numCentroids = 2, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 10)
    val probe = withConf("spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      Similarity.ivfSearch(index, queries, k = 3, nprobe = 2, minCosine = None)
    }
    // recompute each emitted score from the expressions; the probe
    // rounds to 4 decimals in its final projection, so compare there
    val q = emb.select(col("vec_id").as("query_id"),
      expr("quantize_i8(embedding)").as("qa"))
    val c = emb.select(col("vec_id").as("neighbor_id"),
      expr("quantize_i8(embedding)").as("qb"))
    val diff = probe.join(q, "query_id").join(c, "neighbor_id")
      .withColumn("ref", round(expr("cosine_sim_i8(qa, qb)"), 4))
      .filter(col("cosine") =!= col("ref"))
      .count()
    assert(diff == 0, "int8 probe scores drifted from cosine_sim_i8(quantize_i8(.))")
  }

  test("replicate gate budgets the RESIDENT copy: int8 replicates where float cannot") {
    val index = Similarity.ivfBuild(emb, numCentroids = 4, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 10)
    val dim = 64
    val vecWidth = dim.toLong * 4 + 24
    val i8Width = dim.toLong + 40
    val st = index.assigned.queryExecution.optimizedPlan.stats
    val rows = st.rowCount.getOrElse(BigInt(st.sizeInBytes.toLong) / vecWidth + 1)
    // a budget BETWEEN the int8 and float resident estimates
    val budget = ((rows * i8Width + rows * vecWidth) / 2).toString
    def planOf(int8: Boolean): String = {
      val confs = Seq("spark.graft.ann.replicateIndexBytes" -> budget) ++
        (if (int8) Seq("spark.graft.ann.probeInt8" -> "true") else Nil)
      withConf(confs: _*) {
        val df = Similarity.ivfSearch(index, queries, k = 3, nprobe = 2, minCosine = None)
        df.collect()
        df.queryExecution.executedPlan.toString
      }
    }
    val distributed = planOf(int8 = false)
    assert(distributed.contains("ivf_block_topk") || distributed.contains("block_cross_topk"),
      "float path over budget should land on a distributed orientation")
    val replicated = planOf(int8 = true)
    assert(!replicated.contains("ivf_block_topk") && !replicated.contains("block_cross_topk"),
      "int8 resident copy fits the same budget and must replicate")
  }

  test("conf default is off and a malformed value fails naming the conf") {
    assert(!graft.GraftConf.annProbeInt8(spark))
    withConf("spark.graft.ann.probeInt8" -> "yes") {
      val e = intercept[IllegalArgumentException](graft.GraftConf.annProbeInt8(spark))
      assert(e.getMessage.contains("spark.graft.ann.probeInt8"))
    }
  }
}
