package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  private def one(text: String) = Seq(text).toDF("t")

  test("tokens lowercases, splits on whitespace runs, drops empties") {
    val r = one("  The QUICK  brown\tfox ").select(tokens($"t")).first().getSeq[String](0)
    assert(r == Seq("the", "quick", "brown", "fox"))
  }

  test("tokenCount and stopwordCount") {
    val df = one("the cat sat on the mat")
    assert(df.select(tokenCount($"t")).first().getInt(0) == 6)
    assert(df.select(stopwordCount($"t")).first().getInt(0) == 3) // the, on, the
  }

  test("punctRatio handles empty and punctuated text") {
    assert(one("").select(punctRatio($"t")).first().getDouble(0) == 0.0)
    val r = one("a.b!c?").select(punctRatio($"t")).first().getDouble(0)
    assert(math.abs(r - 0.5) < 1e-9)
  }

  test("qualityScore is bounded [0,1] and favors fluent text") {
    val good = one("the quick brown fox and the lazy dog ran to the hill in a storm " * 4)
      .select(qualityScore($"t")).first().getDouble(0)
    val bad = one("!!! ??? ...").select(qualityScore($"t")).first().getDouble(0)
    assert(good > bad)
    assert(good <= 1.0 && bad >= 0.0)
  }

  test("langId picks the language with most marker hits") {
    assert(one("the cat and the dog is here").select(langId($"t")).first().getString(0) == "en")
    assert(one("el gato y la casa de que").select(langId($"t")).first().getString(0) == "es")
    assert(one("xyzzy plugh").select(langId($"t")).first().getString(0) == "und")
  }

  test("shingles are distinct k-grams") {
    val r = one("abcd").select(shinglesOf($"t", 3)).first().getSeq[String](0)
    assert(r == Seq("abc", "bcd"))
  }

  test("minhash signature: equal texts equal, different texts differ") {
    val df = Seq("the same text here", "the same text here", "totally other words")
      .toDF("t").select(minhashSignature($"t").as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).length == 16)
  }

  test("rollingFingerprint is deterministic and content-sensitive") {
    val df = Seq("abc", "abc", "abd").toDF("t")
      .select(rollingFingerprint($"t").as("f"))
    val fs = df.collect().map(_.getLong(0))
    assert(fs(0) == fs(1))
    assert(fs(0) != fs(2))
    assert(fs.forall(f => f >= 0 && f < 1000000007L))
  }

  test("wordNgrams + jaccard") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "x y z w")).toDF("l", "r")
      .select(jaccard(wordNgrams($"l", 2), wordNgrams($"r", 2)).as("j"))
    val js = df.collect().map(_.getDouble(0))
    assert(js(0) == 1.0)
    assert(js(1) == 0.0)
  }

  test("subwordCount splits at punctuation boundaries") {
    val n = one("don't stop-me now").select(subwordCount($"t")).first().getInt(0)
    assert(n == 7) // don ' t stop - me now
  }

  test("portableSimhash32: deterministic, 32-bit, and hamming tracks token overlap") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",      // base
      "the quick brown fox jumps over the lazy cat",      // 1 token differs
      "entirely disjoint vocabulary with other words here" // no overlap
    ).toDF("t").select(portableSimhash32($"t").as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0 && h < (1L << 32)), s"not 32-bit: ${hs.toSeq}")
    assert(hs(0) == one("the quick brown fox jumps over the lazy dog")
      .select(portableSimhash32($"t")).first().getLong(0), "not deterministic")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) < ham(hs(0), hs(2)),
      s"near-dup hamming ${ham(hs(0), hs(1))} !< disjoint ${ham(hs(0), hs(2))}")
  }
}
