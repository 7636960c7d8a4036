package graft.etl

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import DType._

/** Property-based gates for the per-value type detectors: the classifier
  * faces ARBITRARY text from a 100 TB crawl, so totality (never throws,
  * always a DType) and the reference's classification invariants must
  * hold on adversarial input, not just the hand-picked examples in
  * TypeInferenceSpec. Raw ScalaCheck driven from ScalaTest (no bridge
  * dependency); fixed seed-independent properties, 500 cases each.
  */
class TypeDetectorPropertySpec extends AnyFunSuite {
  import TypeInference._

  private def check(name: String, prop: Prop, cases: Int = 500): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, s"$name: $res")
  }

  test("guessType is total on arbitrary unicode strings") {
    check("total", Prop.forAll(Gen.asciiStr.flatMap(a =>
      Gen.oneOf(Gen.const(a), Gen.identifier, Gen.numStr,
        org.scalacheck.Arbitrary.arbitrary[String]).map(_.toString))) { s =>
      guessType(s); true // must not throw on any input
    })
  }

  test("integers classify into the width the reference's thresholds dictate") {
    // bound at ±9e18: past ~9.2e18 the detector deliberately degrades to
    // Num (double rounding near Long.MaxValue would make the bigint cast
    // unsafe — documented in guessType)
    check("int widths", Prop.forAll(Gen.chooseNum(-9000000000000000000L, 9000000000000000000L)) { v =>
      val t = guessType(v.toString)
      val expected =
        if (v == 0L || v == 1L) SmallInt
        else if (v >= -32768 && v <= 32767) SmallInt
        else if (v >= Int.MinValue && v <= Int.MaxValue) Int32
        else Int64
      t == expected
    })
  }

  test("leading-zero digit strings always stay text (MRN preservation)") {
    val gen = for {
      len <- Gen.choose(1, 18)
      digits <- Gen.listOfN(len, Gen.numChar)
    } yield "0" + digits.mkString
    check("leading zero", Prop.forAll(gen)(s => guessType(s) == Text))
  }

  test("decimal strings classify numeric, never an integer width") {
    val gen = for {
      i <- Gen.chooseNum(-1000000L, 1000000L)
      f <- Gen.choose(1, 999999)
    } yield s"$i.$f"
    check("decimals", Prop.forAll(gen) { s =>
      val t = guessType(s)
      // trailing .0* forms are integers-by-value; anything else is Num
      (t == Num) || (s.toDouble == math.floor(s.toDouble))
    })
  }

  test("classification is trim-invariant and deterministic") {
    check("trim/determinism", Prop.forAll(org.scalacheck.Arbitrary.arbitrary[String]) { s =>
      guessType(s) == guessType(s) && guessType(" " + s + " ") == guessType(s.trim)
    })
  }
}
