package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the native single-pass expressions: empty inputs, nulls,
  * degenerate shingle sizes, and agreement with the HOF reference
  * implementations on the properties that matter (set equality of shingle
  * hashes is not required — different hash families — but cardinalities,
  * dedup behavior, and Jaccard values must line up).
  */
class NativeTextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def withNative[A](body: => A): A = {
    NativeTextExpressions.register(spark)
    body
  }

  test("shingle_hashes: empty string, short string, dedup, sorted output") {
    withNative {
      val df = Seq("", "ab", "aaaaaa", "abcdef").toDF("t")
        .select(expr("shingle_hashes(t, 5)").as("sh"))
      val rows = df.collect().map(_.getSeq[Long](0))
      assert(rows(0).length == 1)            // "" → one empty shingle
      assert(rows(1).length == 1)            // shorter than k → whole string
      assert(rows(2).length == 1)            // "aaaaaa": both 5-shingles are "aaaaa" → dedup to 1
      assert(rows(3).length == 2)            // abcde, bcdef
      rows.foreach(r => assert(r == r.sorted, "output must be sorted"))
      rows.foreach(r => assert(r.distinct.length == r.length, "output must be distinct"))
    }
  }

  test("null text yields null signature, not a crash") {
    withNative {
      val df = Seq(Some("abc"), None).toDF("t")
        .select(expr("shingle_hashes(t, 3)").as("sh"),
          expr("simhash64_native(t)").as("sim"))
      val rows = df.collect()
      assert(!rows(0).isNullAt(0) && !rows(0).isNullAt(1))
      assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    }
  }

  test("minhash_sig on empty shingle set returns MaxValue lanes") {
    withNative {
      val sig = Seq(Seq.empty[Long]).toDF("sh")
        .select(expr("minhash_sig(sh, 4)")).first().getSeq[Long](0)
      assert(sig == Seq.fill(4)(Long.MaxValue))
    }
  }

  test("jaccard_sorted: identical=1, disjoint=0, empty=0, partial correct") {
    withNative {
      val df = Seq(
        (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
        (Seq(1L, 2L), Seq(3L, 4L)),
        (Seq.empty[Long], Seq.empty[Long]),
        (Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L)))
        .toDF("a", "b")
        .select(expr("jaccard_sorted(a, b)").as("j"))
      val js = df.collect().map(_.getDouble(0)).toSeq
      assert(js == Seq(1.0, 0.0, 0.0, 2.0 / 6.0))
    }
  }

  test("simhash64_native: identical texts equal, near texts closer than far") {
    withNative {
      val df = Seq(
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox leaps over the lazy dog",
        "entirely unrelated words about query planners")
        .toDF("t").select(expr("simhash64_native(t)").as("s"))
      val s = df.collect().map(_.getLong(0))
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      assert(s(0) == s(1))
      assert(ham(s(0), s(2)) < ham(s(0), s(3)))
    }
  }

  test("token_count/stopword_count/punct_ratio native == HOF on edge cases") {
    withNative {
      val texts = Seq(
        "the quick brown fox, jumps! over the lazy dog.",
        "", "   ", "one", "  leading and trailing  ",
        "tabs\tand\nnewlines\r\nmixed  runs",
        "ALL CAPS THE AND OF", "!!!...,,,", "a b c d e f g",
        "punct:mid;word.split, counts? chars!")
      val df = texts.toDF("t").select($"t",
        graft.functions.TextFunctions.tokenCount($"t").as("hof_tok"),
        expr("token_count_native(t)").as("nat_tok"),
        graft.functions.TextFunctions.stopwordCount($"t").as("hof_stop"),
        expr("stopword_count_native(t)").as("nat_stop"),
        graft.functions.TextFunctions.punctRatio($"t").as("hof_punct"),
        expr("punct_ratio_native(t)").as("nat_punct"))
      df.collect().foreach { r =>
        assert(r.getInt(1) == r.getInt(2), s"tokens differ on '${r.getString(0)}'")
        assert(r.getInt(3) == r.getInt(4), s"stopwords differ on '${r.getString(0)}'")
        assert(math.abs(r.getDouble(5) - r.getDouble(6)) < 1e-15,
          s"punct differs on '${r.getString(0)}'")
      }
    }
  }

  test("word_ngram_hashes matches xxhash64 over the HOF wordNgrams exactly") {
    withNative {
      val texts = Seq(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "  Mixed   CASE and\tweird\nwhitespace padding here  ",
        "short doc", "one", "", "   ",
        "repeat repeat repeat repeat repeat repeat repeat repeat repeat")
      for (n <- Seq(2, 3, 8)) {
        val df = texts.toDF("t").select($"t",
          array_sort(expr(s"word_ngram_hashes(t, $n)")).as("native"),
          array_sort(array_distinct(transform(
            graft.functions.TextFunctions.wordNgrams($"t", n),
            g => xxhash64(g)))).as("hof"))
        df.collect().foreach { r =>
          assert(r.getSeq[Long](1) == r.getSeq[Long](2),
            s"n=$n differs on '${r.getString(0)}'")
        }
      }
    }
  }

  test("native and HOF minhash agree on equality structure") {
    withNative {
      val texts = Seq("same text here", "same text here", "different words entirely")
      val native = texts.toDF("t")
        .select(lower($"t").as("lt"))
        .select(expr("minhash_sig(shingle_hashes(lt, 5), 8)").as("sig"))
        .collect().map(_.getSeq[Long](0))
      assert(native(0) == native(1))
      assert(native(0) != native(2))
    }
  }

  test("deflate_len: real deflate stream (inflates back), separates repetitive from random") {
    withNative {
      val repetitive = "spam ham " * 500
      // xxhash-derived hex: incompressible but reproducible (no RNG in tests)
      val random = (0 until 500).map(i =>
        f"${scala.util.hashing.MurmurHash3.stringHash(i.toString)}%08x").mkString
      val df = Seq(repetitive, random).toDF("t")
        .select($"t", expr("deflate_len(t, 6)").as("dl"), octet_length($"t").as("n"))
      val rows = df.collect()
      val Seq(repRatio, rndRatio) =
        rows.toSeq.map(r => r.getInt(1).toDouble / r.getInt(2))
      assert(repRatio < 0.05, s"repetitive text should compress hard, got $repRatio")
      assert(rndRatio > 0.5, s"random hex should not compress below half, got $rndRatio")

      // the emitted length must be that of a genuine raw-deflate stream:
      // re-compress with java.util.zip directly and compare byte counts
      rows.foreach { r =>
        val bytes = r.getString(0).getBytes("UTF-8")
        val d = new java.util.zip.Deflater(6, true)
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](bytes.length + 1024)
        var total = 0
        while (!d.finished()) total += d.deflate(buf)
        d.end()
        assert(r.getInt(1) == total, "expression must equal a direct Deflater run")
      }
    }
  }

  test("canon_text: case, diacritics, ligatures, punctuation runs, non-BMP, CJK") {
    withNative {
      val in = Seq(
        "Café  Noir!",     // accent + case + double space + punct
        "ﬁle-system",      // ligature ﬁ decomposes to fi (NFKD compat)
        "a🙂b",  // emoji is a separator, not a letter
        "漢字 テスト", // CJK + katakana survive untouched
        "𝒜𝓑", // non-BMP math letters → "ab" (NFKD then lower)
        "  !!  ",          // pure separators canonicalize to empty
        "Ångström"         // Å → a (ring dropped), ö → o
      ).toDF("t")
      val got = in.select(expr("canon_text(t)")).collect().map(_.getString(0))
      assert(got(0) == "cafe noir", s"got '${got(0)}'")
      assert(got(1) == "file system", s"got '${got(1)}'")
      assert(got(2) == "a b", s"got '${got(2)}'")
      assert(got(3) == "漢字 テスト", s"got '${got(3)}'")
      assert(got(4) == "ab", s"got '${got(4)}'")
      assert(got(5) == "", s"got '${got(5)}'")
      assert(got(6) == "angstrom", s"got '${got(6)}'")
    }
  }

  test("canon_text: null-safe, idempotent, and ASCII-identity on clean text") {
    withNative {
      val rows = Seq(Some("already clean text 123"), None).toDF("t")
        .select(expr("canon_text(t)").as("a"), expr("canon_text(canon_text(t))").as("b"))
        .collect()
      assert(rows(0).getString(0) == "already clean text 123")
      assert(rows(0).getString(0) == rows(0).getString(1), "must be idempotent")
      assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    }
  }

  test("deflate_len: null-safe, deterministic across evaluations, empty string") {
    withNative {
      val df = Seq(Some("abc abc abc"), None, Some("")).toDF("t")
        .select(expr("deflate_len(t, 6)").as("a"), expr("deflate_len(t, 6)").as("b"))
      val rows = df.collect()
      assert(rows(0).getInt(0) == rows(0).getInt(1))
      assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
      assert(rows(2).getInt(0) > 0, "empty string still emits a (tiny) deflate block")
    }
  }

}
