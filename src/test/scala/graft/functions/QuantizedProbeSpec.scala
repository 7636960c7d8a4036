package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The int8-scored replicated probe (spark.graft.ann.probeInt8): the
  * scalar-quantizer index copy — 4× smaller resident arrays, 16-lane
  * integer SIMD dots — used to SELECT a shortlist that an in-operator
  * float rerank rescores exactly. Contracts pinned here:
  *
  *   - Default is AUTO: with the conf unset and the float copy inside
  *     the replicate budget, the probe is the bit-identical float path
  *     (the orientation-equality specs pin that); when only the int8
  *     copy fits, auto replicates quantized instead of falling to the
  *     distributed orientations.
  *   - Same output contract (schema, rank 1..k, self-exclusion).
  *   - Deterministic: two int8 runs return identical rows.
  *   - Emitted scores are EXACT (the rerank): every score equals the
  *     float `cosine_sim` of the two real vectors, and `minCosine`
  *     filters on the exact score — quantization affects shortlist
  *     membership only.
  *   - Quantization error is bounded IN EFFECT: nprobe=all int8 top-k
  *     recalls ≥ 0.8 of the float top-k per query on the real fixture.
  *   - The pure gate function ([[Similarity.replicatedDecision]])
  *     covers every branch (the former non-long-id skip is retired: generic ids surrogate-encode before the gate).
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

  test("int8 probe scores are EXACT: every emitted cosine is the float cosine_sim") {
    VectorFunctions.register(spark)
    val index = Similarity.ivfBuild(emb, numCentroids = 2, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 10)
    val probe = withConf("spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      Similarity.ivfSearch(index, queries, k = 3, nprobe = 2, minCosine = None)
    }
    // recompute each emitted score with the exact expression; the probe
    // rounds to 4 decimals in its final projection, so compare there
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("qa"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("qb"))
    val diff = probe.join(q, "query_id").join(c, "neighbor_id")
      .withColumn("ref", round(expr("cosine_sim(qa, qb)"), 4))
      .filter(col("cosine") =!= col("ref"))
      .count()
    assert(diff == 0, "int8 probe emitted a non-exact cosine (rerank missing?)")
  }

  test("int8 probe at nprobe=all with a wide rerank equals the float path exactly") {
    // with every list probed and the shortlist overfetch covering the
    // whole corpus, quantization cannot change shortlist membership →
    // the reranked int8 result must EQUAL the float path, including a
    // minCosine floor applied on exact scores (the near-threshold
    // misclassification ADVICE flagged is structurally gone)
    val index = Similarity.ivfBuild(emb, numCentroids = 2, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 30)
    val n = emb.count().toInt
    val float = withConf(
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 2,
        minCosine = Some(0.2)))
    }
    val int8 = withConf("spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.rerankFactor" -> n.toString,
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 2,
        minCosine = Some(0.2)))
    }
    assert(int8 == float,
      s"full-shortlist int8 != float (|int8|=${int8.size}, |float|=${float.size})")
  }

  test("replicate gate budgets the RESIDENT copy: int8 replicates where float cannot") {
    val index = Similarity.ivfBuild(emb, numCentroids = 4, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 10)
    val dim = 64
    val vecWidth = dim.toLong * 4 + 24
    val i8Width = dim.toLong + 40
    // the same honest estimate the gate itself acts on (r17: footer row
    // counts, not compressed sizeInBytes / decoded width)
    val rows = Similarity.estRowsHonest(index.assigned, vecWidth)._1
    // a budget BETWEEN the int8 and float resident estimates
    val budget = ((rows * i8Width + rows * vecWidth) / 2).toString
    def planOf(mode: String): String = {
      val confs = Seq("spark.graft.ann.replicateIndexBytes" -> budget,
        "spark.graft.ann.probeInt8" -> mode)
      withConf(confs: _*) {
        val df = Similarity.ivfSearch(index, queries, k = 3, nprobe = 2, minCosine = None)
        df.collect()
        df.queryExecution.executedPlan.toString
      }
    }
    val distributed = planOf("false")
    assert(distributed.contains("ivf_block_topk") || distributed.contains("block_cross_topk"),
      "probeInt8=false over the float budget should land on a distributed orientation")
    val replicated = planOf("true")
    assert(!replicated.contains("ivf_block_topk") && !replicated.contains("block_cross_topk"),
      "int8 resident copy fits the same budget and must replicate")
    // AUTO takes the int8 replication in the same spot — and returns the
    // same rows as the forced regime
    val auto = planOf("auto")
    assert(!auto.contains("ivf_block_topk") && !auto.contains("block_cross_topk"),
      "auto regime must replicate quantized when only the int8 copy fits")
  }

  test("auto regime keeps the float path where the float copy fits") {
    val index = Similarity.ivfBuild(emb, numCentroids = 4, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 20)
    val unset = withConf(
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None))
    }
    val float = withConf("spark.graft.ann.probeInt8" -> "false",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 4, minCosine = None))
    }
    assert(unset == float,
      "default (auto) drifted from the float path despite the float copy fitting")
  }

  test("the pure gate covers every branch; the non-long-id skip is retired") {
    import Similarity.replicatedDecision
    val rows = BigInt(1000)
    val dim = 64
    val floatW = dim.toLong * 4 + 24
    def d(budget: Long, mode: String = "auto", pq: Boolean = false,
          eligible: Boolean = true) =
      replicatedDecision(rows, dim, floatW, pqM = 8, budget = budget,
        broadcastEligible = eligible, int8Mode = mode, pq = pq)
    val floatBytes = (rows * floatW).toLong
    val i8Bytes = (rows * (dim + 40)).toLong
    val pqBytes = (rows * (8 + 40)).toLong
    // auto ladder: float → int8 → distributed
    assert(d(floatBytes) == Right(("float",
      s"est resident $floatBytes B <= replicate budget $floatBytes B")))
    assert(d(i8Bytes).exists(_._1 == "int8"))
    assert(d(pqBytes).isLeft, "auto must not replicate below the int8 width")
    // forced modes
    assert(d(i8Bytes, mode = "true").exists(_._1 == "int8"))
    assert(d(floatBytes, mode = "true").exists(_._1 == "int8"),
      "probeInt8=true quantizes even where float fits (the A/B knob)")
    assert(d(i8Bytes, mode = "false").isLeft,
      "probeInt8=false must never replicate quantized")
    // pq wins over the int8 mode and has the smallest width
    assert(d(pqBytes, pq = true).exists(_._1 == "pq"))
    assert(d(pqBytes - 1, pq = true).isLeft)
    // skip reasons are named (greppable); the former non-long-id skip is
    // RETIRED — generic ids map onto the i64 surrogate before the gate,
    // so the decision no longer depends on the caller's id type
    val noBc = d(floatBytes, eligible = false)
    assert(noBc.isLeft && noBc.swap.exists(_.contains("maxBroadcastQueries")))
  }

  test("probeRerank=off emits approximate scores deterministically (the q204 contract)") {
    VectorFunctions.register(spark)
    val index = Similarity.ivfBuild(emb, numCentroids = 2, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 20)
    assert(graft.GraftConf.annProbeRerank(spark) == "exact", "default must stay exact")
    val off = withConf("spark.graft.ann.probeInt8" -> "true",
      "spark.graft.ann.probeRerank" -> "off",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      val r1 = rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 2,
        minCosine = None))
      val r2 = rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 2,
        minCosine = None))
      assert(r1 == r2, "off-mode probe is not deterministic")
      r1
    }
    // the emitted approximate scores stay within the int8 margin of the
    // exact cosine (the bound the exact-rerank floor relaxation uses)
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("qa"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("qb"))
    import spark.implicits._
    val offDf = off.toSeq.toDF("query_id", "neighbor_id", "cosine", "rk")
    val maxErr = offDf.join(q, "query_id").join(c, "neighbor_id")
      .select(abs(col("cosine") - expr("cosine_sim(qa, qb)")).as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    assert(maxErr <= Similarity.Int8FloorMargin,
      f"off-mode score error $maxErr%.4f exceeds the documented margin")
    // a malformed value fails naming the conf
    withConf("spark.graft.ann.probeRerank" -> "none") {
      val e = intercept[IllegalArgumentException](graft.GraftConf.annProbeRerank(spark))
      assert(e.getMessage.contains("probeRerank"))
    }
  }

  test("pqFloorMargin bounds observed ADC score error on the dense fixture (off-mode)") {
    // the PQ twin of the int8 off-mode margin pin: the floor relaxation
    // asserts |approx − exact| ≤ margin for shortlist survivors, so the
    // margin must dominate the ADC error actually observed — on THIS
    // dense fixture (ADC error is dataset-dependent; the conf exists so a
    // coarser corpus can widen it from its own off-mode measurement)
    VectorFunctions.register(spark)
    val index = Similarity.ivfBuild(emb, numCentroids = 2, trainIters = 1)
    val queries = emb.filter(col("vec_id") < 20)
    val off = withConf("spark.graft.ann.probePq" -> "true",
      "spark.graft.ann.probeRerank" -> "off",
      "spark.graft.ann.replicateIndexBytes" -> Long.MaxValue.toString) {
      rows(Similarity.ivfSearch(index, queries, k = 5, nprobe = 2,
        minCosine = None))
    }
    assert(off.nonEmpty)
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("qa"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("qb"))
    import spark.implicits._
    val offDf = off.toSeq.toDF("query_id", "neighbor_id", "cosine", "rk")
    val maxErr = offDf.join(q, "query_id").join(c, "neighbor_id")
      .select(abs(col("cosine") - expr("cosine_sim(qa, qb)")).as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    assert(maxErr <= graft.GraftConf.annPqFloorMargin(spark),
      f"observed ADC error $maxErr%.4f exceeds pqFloorMargin " +
        f"${graft.GraftConf.annPqFloorMargin(spark)}%.2f — widen the default " +
        "or fix the codebooks; the floor relaxation is unsound otherwise")
    // the margin is a conf (dataset-dependent), validated on read
    withConf("spark.graft.ann.pqFloorMargin" -> "-0.1") {
      val e = intercept[IllegalArgumentException](
        graft.GraftConf.annPqFloorMargin(spark))
      assert(e.getMessage.contains("pqFloorMargin"))
    }
    withConf("spark.graft.ann.pqFloorMargin" -> "0.25") {
      assert(graft.GraftConf.annPqFloorMargin(spark) == 0.25)
    }
  }

  test("conf default is auto and a malformed value fails naming the conf") {
    assert(graft.GraftConf.annProbeInt8Mode(spark) == "auto")
    withConf("spark.graft.ann.probeInt8" -> "yes") {
      val e = intercept[IllegalArgumentException](graft.GraftConf.annProbeInt8Mode(spark))
      assert(e.getMessage.contains("spark.graft.ann.probeInt8"))
    }
    withConf("spark.graft.ann.rerankFactor" -> "0") {
      val e = intercept[IllegalArgumentException](graft.GraftConf.annRerankFactor(spark))
      assert(e.getMessage.contains("rerankFactor"))
    }
  }
}
