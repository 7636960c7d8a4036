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

  test("ngramContainmentPairs catches a short doc embedded in a long one that Jaccard misses") {
    val embedded = Seq(
      (1L, "alpha beta gamma delta"), // fully contained in doc 2's gram set
      (2L, "intro words first alpha beta gamma delta and then lots of " +
        "additional unrelated trailing content follows here for a while longer"),
      (3L, "completely different text with nothing shared at all present")
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(embedded, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont.keySet == Set((1L, 2L)), s"got ${cont.keySet}")
    assert(cont((1L, 2L)) == 1.0, "doc 1's grams are all inside doc 2")
    // symmetric Jaccard on the same pair is far below the containment
    val jac = Dedup.ngramJaccardAllPairs(embedded, "doc_id", "text", n = 3, threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((1L, 2L)) < 0.2, s"jaccard should be small: ${jac((1L, 2L))}")
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

  test("dedupSegments removes later duplicate segments and keeps the carrier verbatim") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),            // segs: "a b c","d e f"; tail "g h"
      (2L, "x y z d e f p q r"),          // "d e f" is a dup of doc 1's
      (3L, "m n")                         // shorter than one window: all tail
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(corpus, "doc_id", "text", window = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("a b c d e f g h", 0L), "first carrier keeps full text")
    assert(out(2L) == ("x y z p q r", 1L), "duplicate middle segment removed")
    assert(out(3L) == ("m n", 0L), "sub-window doc survives as pure tail")
  }

  test("dedupSegments: within-doc repeats collapse to the first occurrence") {
    val corpus = Seq((7L, "x y z x y z x y")).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(corpus, "doc_id", "text", window = 3).collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "x y z x y", s"got '${out.head.getString(1)}'")
    assert(out.head.getLong(2) == 1L)
  }

  test("dedupSegments is the identity on a corpus with no repeated segment") {
    val corpus = (0 until 40)
      .map(i => (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSegments(corpus, "doc_id", "text", window = 3)
    val joined = corpus.join(out, corpus("doc_id") === out("id"))
    assert(joined.filter(col("clean_text") =!= col("text") || col("n_removed") =!= 0).count() == 0,
      "no-dup corpus must reconstruct verbatim")
  }

  test("suppressBoilerplate drops ALL occurrences of over-threshold segments, carrier included") {
    val corpus = Seq(
      (1L, "h d r a b c d e f"),  // "h d r" boilerplate; carrier of "a b c"/"d e f" dups
      (2L, "h d r a b c p q r"),  // boilerplate + one dup segment (df=2, kept)
      (3L, "h d r x y z w w w"),  // boilerplate + unique segments
      (4L, "m n")                 // sub-window: pure tail, untouched
    ).toDF("doc_id", "text")
    val out = Dedup.suppressBoilerplate(corpus, "doc_id", "text", window = 3, maxDf = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // "h d r" is in 3 docs (> maxDf=2): removed everywhere, first doc included
    assert(out(1L) == ("a b c d e f", 1L), "boilerplate must not keep a carrier")
    // "a b c" df=2 <= maxDf: kept in BOTH docs (no first-wins collapse)
    assert(out(2L) == ("a b c p q r", 1L))
    assert(out(3L) == ("x y z w w w", 1L))
    assert(out(4L) == ("m n", 0L), "sub-window doc survives as pure tail")
  }

  test("suppressBoilerplate is the identity when no segment exceeds the df threshold") {
    val corpus = (0 until 30)
      .map(i => (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g"))
      .toDF("doc_id", "text")
    val out = Dedup.suppressBoilerplate(corpus, "doc_id", "text", window = 3, maxDf = 2)
    val joined = corpus.join(out, corpus("doc_id") === out("id"))
    assert(joined.filter(col("clean_text") =!= col("text") || col("n_removed") =!= 0).count() == 0,
      "under-threshold corpus must reconstruct verbatim")
  }

  test("textFuzzyJoin matches brute-force cross-table pairs exactly") {
    val left = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val right = Seq(
      (10L, "alpha beta gamma delta epsilon eta"),
      (11L, "eight nine ten eleven twelve thirteen"),
      (12L, "one two three four five six extra")).toDF("doc_id", "text")
    val threshold = 0.3
    val got = Dedup.textFuzzyJoin(left, right, "doc_id", "text", n = 3, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lrows = left.collect().map(r => (r.getLong(0), r.getString(1)))
    val rrows = right.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (la, ta) <- lrows; (rb, tb) <- rrows
      j = bruteJaccard(ta, tb, 3) if j >= threshold
    } yield (la, rb) -> j).toMap
    assert(got.keySet == brute.keySet, s"got ${got.keySet}, brute ${brute.keySet}")
    brute.foreach { case (pair, j) =>
      assert(math.abs(got(pair) - j) < 1e-12, s"$pair: got ${got(pair)}, brute $j") }
  }

  test("incrementalDedup suppresses seen keys and keeps min-id per new key") {
    val corpus = Seq(
      (1L, "seen.example", "en"),
      (2L, "seen.example", "de")
    ).toDF("doc_id", "source", "lang")
    val batch = Seq(
      (10L, "seen.example", "en"),  // key already in corpus → dropped
      (11L, "fresh.example", "en"), // new key, min id → kept
      (12L, "fresh.example", "en"), // same new key, larger id → dropped
      (13L, "seen.example", "fr")   // same source but new (source, lang) → kept
    ).toDF("doc_id", "source", "lang")
    val out = Dedup.incrementalDedup(batch, corpus, Seq("source", "lang"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(11L, 13L), s"got $out")
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
