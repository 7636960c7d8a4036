package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for [[Similarity.semanticDedup]] (SemDeDup): drops are
  * exact-verified (precision 1.0), exact duplicates are always caught
  * (same argmax → same cluster), and cluster-scoped recall on a genuinely
  * clustered corpus stays high vs the global exact drop-set.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(29)
  private val centers = Array.fill(6)(Array.fill(12)(rnd.nextGaussian()))
  // 6 clusters × 30 vectors; within each cluster, ids ≡ 0 (mod 3) carry two
  // planted near-identical copies (tiny perturbation → cosine ≈ 1)
  private val clustered = (0 until 180).map { i =>
    val c = centers(i / 30)
    val v =
      if (i % 3 != 0) c.map(x => (x + 0.4 * rnd.nextGaussian()).toFloat)
      else c.map(x => (x + 1e-4 * (i / 3 + 1) * 0.01).toFloat) // near-dup family
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  test("exact duplicates are always dropped down to the min id") {
    val base = (0 until 60).map { i =>
      (i.toLong, centers(i % 6).map(x => (x + 0.4 * rnd.nextGaussian()).toFloat))
    }
    val dupes = Seq((100L, base(7)._2), (101L, base(7)._2), (102L, base(19)._2))
    val corpus = (base ++ dupes).toDF("vec_id", "embedding")
    val survivors = Similarity.semanticDedup(corpus, threshold = 0.999,
      numCentroids = 6).select("vec_id").as[Long].collect().toSet
    assert(!survivors.contains(100L) && !survivors.contains(101L) && !survivors.contains(102L),
      "identical copies share an argmax cluster, so they must always be dropped")
    assert(survivors.contains(7L) && survivors.contains(19L),
      "the min-id representative survives")
  }

  test("precision 1.0: every dropped vector has a smaller-id exact near-dup") {
    val threshold = 0.995
    val survivors = Similarity.semanticDedup(clustered, threshold, numCentroids = 6)
      .select("vec_id").as[Long].collect().toSet
    val dropped = (0L until 180L).toSet -- survivors
    val exactPairs = Similarity.exactCosinePairs(clustered, threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hasSmallerPartner = exactPairs.map(_._2).toSet
    assert(dropped.subsetOf(hasSmallerPartner),
      s"dropped without an exact smaller-id partner: ${dropped -- hasSmallerPartner}")
  }

  test("recall >= 0.8 vs the global exact drop-set on a clustered corpus") {
    val threshold = 0.995
    val exactPairs = Similarity.exactCosinePairs(clustered, threshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exactDropped = exactPairs.map(_._2).toSet
    assert(exactDropped.nonEmpty, "fixture must contain planted near-dups")
    val survivors = Similarity.semanticDedup(clustered, threshold, numCentroids = 6)
      .select("vec_id").as[Long].collect().toSet
    val dropped = (0L until 180L).toSet -- survivors
    val recall = dropped.intersect(exactDropped).size.toDouble / exactDropped.size
    assert(recall >= 0.8, s"recall $recall below 0.8 (missed cross-cluster pairs only)")
  }
}
