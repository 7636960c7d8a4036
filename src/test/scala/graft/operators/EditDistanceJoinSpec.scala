package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Losslessness proof for the q-gram-prefiltered edit-distance join:
  * the filtered result must equal the naive all-pairs Levenshtein join
  * on every input, including the adversarial short-string regime where
  * within-k pairs share ZERO q-grams and only the short bucket saves
  * them.
  */
class EditDistanceJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(strings: Seq[String], k: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ds = strings.distinct
    (for {
      a <- ds; b <- ds if a < b
      dist = lev(a, b) if dist <= k
    } yield (a, b, dist)).toSet
  }

  private def joined(strings: Seq[String], k: Int): Set[(String, String, Int)] =
    EditDistanceJoin.selfJoin(strings.toDF("s"), "s", k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("matches brute force on a typo cluster") {
    val s = Seq("forest", "forset", "fores", "forrest", "florist",
      "chocolate", "choclate", "chocolat", "vanilla", "vanila")
    assert(joined(s, 2) == brute(s, 2))
    assert(joined(s, 1) == brute(s, 1))
  }

  test("short strings within k sharing zero grams are found (short bucket)") {
    // k=2, q=2: "ab" vs "cd" is distance 2 with no common bigram — the
    // count bound is vacuous and only the short bucket can emit the pair.
    val s = Seq("ab", "cd", "a", "b", "xy", "x", "abc", "abd")
    val got = joined(s, 2)
    assert(got == brute(s, 2))
    assert(got.contains(("ab", "cd", 2)), "zero-overlap short pair lost")
  }

  test("boundary pairs straddling the short/long cut are not duplicated or lost") {
    // q=2, k=1 → shortMax=3; lengths 3 and 4 straddle the cut.
    val s = Seq("cat", "cart", "car", "cars", "ca", "bat", "hat")
    assert(joined(s, 1) == brute(s, 1))
  }

  test("repeated-gram strings respect the multiset (not set) bound") {
    // "aaaa" vs "aaab": grams {aa×3} vs {aa×2, ab}; least-count sum = 2.
    val s = Seq("aaaa", "aaab", "aabb", "abab", "bbbb", "aaaaa")
    assert(joined(s, 1) == brute(s, 1))
    assert(joined(s, 2) == brute(s, 2))
  }

  test("duplicate input values collapse before pairing") {
    val s = Seq("alpha", "alpha", "alphb", "alphb", "beta")
    val got = joined(s, 1)
    assert(got == brute(s, 1))
    assert(got == Set(("alpha", "alphb", 1)))
  }

  test("randomized adversarial equality (seeded)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abc"
    val strings = Seq.fill(120)(
      (0 until (1 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    assert(joined(strings, 2) == brute(strings, 2))
  }
}
