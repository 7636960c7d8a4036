package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 dedup additions: the exact inverted-index n-gram Jaccard
  * operator (recall 1.0 by construction — asserted against a brute-force
  * computation here) and Bloom-filter reference suppression (no false
  * negatives structurally; false-positive rate bounded empirically).
  */
class ExactJaccardBloomSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 and 2 share most trigrams; doc 3 shares one; doc 4 is disjoint
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon eta"),
    (3L, "omega psi alpha beta gamma chi phi"),
    (4L, "one two three four five six seven")
  ).toDF("doc_id", "text")

  /** Brute-force trigram Jaccard via the same tokenizer (lowercase,
    * whitespace split, clipped windows) computed in plain Scala.
    */
  private def bruteJaccard(a: String, b: String, n: Int): Double = {
    def grams(s: String): Set[String] = {
      val t = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      (0 to math.max(t.length - n, 0)).map(i => t.slice(i, i + n).mkString(" ")).toSet
    }
    val (ga, gb) = (grams(a), grams(b))
    val inter = ga.intersect(gb).size
    if (ga.isEmpty && gb.isEmpty) 1.0
    else inter.toDouble / (ga.size + gb.size - inter)
  }

  test("ngramJaccardAllPairs matches brute force on every pair (recall 1.0, exact values)") {
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (for {
      a <- texts.keys; b <- texts.keys if a < b
      j = bruteJaccard(texts(a), texts(b), 3) if j >= 0.05
    } yield (a, b) -> j).toMap
    val got = Dedup.ngramJaccardAllPairs(docs, "doc_id", "text", n = 3, threshold = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet, s"pair sets differ: $got vs $expected")
    got.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-12, s"jaccard for $k: $v vs ${expected(k)}")
    }
  }

  test("ngramJaccardAllPairs threshold filters, never invents pairs") {
    val strict = Dedup.ngramJaccardAllPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L)), s"only the near-identical pair survives 0.5, got $strict")
    val disjoint = Dedup.ngramJaccardAllPairs(
      docs.filter($"doc_id" isin (1L, 4L)), "doc_id", "text", n = 3, threshold = 0.01)
    assert(disjoint.count() == 0, "disjoint gram sets must yield no pair at any threshold")
  }

  test("suppressBloom has no false negatives: every reference text is dropped") {
    val reference = (0 until 200).map(i => (i.toLong, s"ref document number $i")).toDF("rid", "rtext")
    val corpus = (0 until 200).map(i => (1000L + i, s"ref document number $i"))
      .toDF("doc_id", "text")
    val kept = Dedup.suppressBloom(corpus, reference, "text", "rtext",
      expectedRefDocs = 1000L, fpp = 0.5) // even at an absurd fpp
    assert(kept.count() == 0, "verbatim reference copies must always be suppressed")
  }

  test("suppressBloom false-positive rate stays within 3x the configured fpp") {
    val reference = (0 until 2000).map(i => (i.toLong, s"reference text $i")).toDF("rid", "rtext")
    val corpus = (0 until 4000).map(i => (10000L + i, s"novel corpus text $i"))
      .toDF("doc_id", "text")
    val fpp = 0.02
    val kept = Dedup.suppressBloom(corpus, reference, "text", "rtext",
      expectedRefDocs = 2000L, fpp = fpp).count()
    val fpRate = (4000.0 - kept) / 4000.0
    assert(fpRate <= 3 * fpp, s"false-positive rate $fpRate exceeds 3x fpp=$fpp")
  }

  test("suppressBloom at tiny fpp equals suppressExact, deterministically") {
    val reference = (0 until 100).map(i => (i.toLong, s"shared doc $i")).toDF("rid", "rtext")
    val corpus = ((0 until 50).map(i => (2000L + i, s"shared doc $i")) ++
      (0 until 300).map(i => (3000L + i, s"unique doc $i"))).toDF("doc_id", "text")
    def run(): Set[Long] = Dedup.suppressBloom(corpus, reference, "text", "rtext",
      expectedRefDocs = 1000L, fpp = 1e-9).select("doc_id").as[Long].collect().toSet
    val exact = Dedup.suppressExact(corpus, reference, "text", "rtext")
      .select("doc_id").as[Long].collect().toSet
    val first = run()
    assert(first == exact, "at fpp 1e-9 on 350 probes the bloom result must equal exact")
    assert(run() == first, "the filter build must be deterministic across runs")
  }

  test("suppressBloom keeps the corpus side shuffle-free (scan-local filter)") {
    val reference = Seq((1L, "a ref")).toDF("rid", "rtext")
    val corpus = Seq((2L, "a doc")).toDF("doc_id", "text")
    val plan = Dedup.suppressBloom(corpus, reference, "text", "rtext")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bloom suppression must not shuffle or broadcast-join the corpus side:\n$plan")
  }
}
