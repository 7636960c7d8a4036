package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

import DType._

/** The opt-in free-form date grammar ([[LenientTemporal]]) — the
  * deterministic stand-in for the reference's dateutil leniency
  * (load_tables_daily.py:104–116). Covers: the canonicalizer's accepted
  * shapes and its deliberate rejections, the lenient classifier/vote, the
  * end-to-end lenient narrow (canonicalize → strict cascade → date), a
  * CODEGEN_ONLY pin on the scan-side expression, and a generative
  * render → normalize → parse round-trip over random dates and styles.
  */
class LenientTemporalSpec extends SparkSpec {
  import LenientTemporal.normalize
  import TypeInference.guessType

  test("word-month shapes canonicalize to the strict cascade's form") {
    assert(normalize("March 4th, 2020") == "3/4/2020")
    assert(normalize("4 of march 2020") == "3/4/2020")
    assert(normalize("Wed, Mar 4, 2020") == "3/4/2020")
    assert(normalize("Wednesday, March 4, 2020") == "3/4/2020")
    assert(normalize("4 Mar. 2020") == "3/4/2020")         // dotted abbrev
    assert(normalize("Sept 21 2021") == "9/21/2021")       // 4-letter Sept
    assert(normalize("2020 March 4") == "3/4/2020")        // year-first
    assert(normalize("the 1st of January 2000") == "1/1/2000")
    assert(normalize("DECEMBER 31ST, 1999") == "12/31/1999") // case-blind
  }

  test("times fold in: 24h, am/pm (attached and standalone), seconds") {
    assert(normalize("March 4 2020 7:30 pm") == "3/4/2020 19:30:00")
    assert(normalize("March 4 2020 7:30pm") == "3/4/2020 19:30:00")
    assert(normalize("March 4 2020 7pm") == "3/4/2020 19:00:00")
    assert(normalize("March 4 2020 12:00 am") == "3/4/2020 0:00:00")
    assert(normalize("March 4 2020 12:15 pm") == "3/4/2020 12:15:00")
    assert(normalize("March 4 2020 23:59:58") == "3/4/2020 23:59:58")
  }

  test("2-digit years take the strict list's 2000 base (M/d/uu parity)") {
    assert(normalize("March 4 20") == "3/4/2020")
    assert(normalize("4th March 99") == "3/4/2099")
  }

  test("deliberate rejections return the input verbatim") {
    // no day (dateutil would fill it from `default` = today — the
    // pinned divergence that keeps inference time-independent)
    assert(normalize("March 2020") == "March 2020")
    assert(normalize("4th") == "4th")                   // no month/year
    assert(normalize("March April 2020") == "March April 2020") // 2 months
    assert(normalize("March 4 5 2020 6") == "March 4 5 2020 6") // extra nums
    assert(normalize("March 150 2020") == "March 150 2020")     // 3-digit
    assert(normalize("March 32nd, 2020") == "March 32nd, 2020") // day > 31
    assert(normalize("visited March 4th, 2020") == "visited March 4th, 2020")
    assert(normalize("March 4 2020 13:00 pm") == "March 4 2020 13:00 pm")
    assert(normalize("3/4/2020") == "3/4/2020")   // numeric: strict's turf
    assert(normalize("") == "")
  }

  test("lenient guessType accepts the shapes, strict still refuses them") {
    assert(guessType("March 4th, 2020") == Text)
    assert(guessType("March 4th, 2020", lenient = true) == DateD)
    assert(guessType("March 4 2020 7:30 pm", lenient = true) == Timestamp)
    assert(guessType("March 4 2020 12:00 am", lenient = true) == DateD) // midnight
    assert(guessType("March 2020", lenient = true) == Text)
    // non-temporal verdicts are untouched by the lenient pass
    assert(guessType("32767", lenient = true) == SmallInt)
    assert(guessType("true", lenient = true) == Bool)
    assert(guessType("2020-03-04", lenient = true) == DateD)
  }

  test("lenient vote + narrow recover the civil day end-to-end") {
    import spark.implicits._
    val df = Seq(
      (1L, "March 4th, 2020"), (2L, "4 of march 2020"),
      (3L, "Wed, Mar 4, 2020"), (4L, "March 4 2020 7:30 pm"),
      (5L, "not a date at all")).toDF("id", "raw")
    val strictVote = TypeInference.inferColumnTypes(df.select($"raw"), Some(5))
    assert(strictVote("raw") == Text)
    val vote = TypeInference.inferColumnTypes(
      df.filter($"id" =!= 5).select($"raw"), Some(5), lenient = true)
    assert(vote("raw") == Timestamp) // date ⊔ timestamp
    val out = TypeInference.narrow(df, Map("raw" -> vote("raw")), lenient = true)
      .select($"id", $"raw".cast("date").cast("string").as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 4L).forall(out(_) == "2020-03-04"))
    assert(out(5L) == null) // unparseable degrades to null, never throws
  }

  test("lenient_temporal_norm is codegen'd, not a fallback (CODEGEN_ONLY pin)") {
    import spark.implicits._
    graft.functions.NativeTextExpressions.register(spark)
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val out = Seq("March 4th, 2020", "plain text").toDF("s")
        .select(expr("lenient_temporal_norm(s)").as("n"))
        .collect().map(_.getString(0)).toSet
      assert(out == Set("3/4/2020", "plain text"))
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("generative round-trip: render → normalize → strict parse = identity") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val months = Array("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    val fmt = java.time.format.DateTimeFormatter.ofPattern("M/d/uuuu")
      .withResolverStyle(java.time.format.ResolverStyle.STRICT)
    def suffix(d: Int) =
      if (d % 100 >= 11 && d % 100 <= 13) "th"
      else d % 10 match { case 1 => "st"; case 2 => "nd"; case 3 => "rd"; case _ => "th" }
    val gen = for {
      epochDay <- Gen.choose(
        java.time.LocalDate.of(1950, 1, 1).toEpochDay,
        java.time.LocalDate.of(2099, 12, 31).toEpochDay)
      style <- Gen.choose(0, 3)
    } yield (java.time.LocalDate.ofEpochDay(epochDay), style)
    val prop = Prop.forAll(gen) { case (date, style) =>
      val (m, d, y) = (months(date.getMonthValue - 1), date.getDayOfMonth, date.getYear)
      val rendered = style match {
        case 0 => s"$m $d${suffix(d)}, $y"
        case 1 => s"$d of ${m.toLowerCase} $y"
        case 2 => s"${date.getDayOfWeek.toString.take(3).toLowerCase.capitalize}, ${m.take(3)} $d, $y"
        case _ => s"$m $d $y"
      }
      java.time.LocalDate.parse(normalize(rendered), fmt) == date
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, s"round-trip: $res")
  }

  test("normalize is total on arbitrary strings (never throws)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val prop = Prop.forAll(Gen.oneOf(Gen.asciiStr, Gen.identifier, Gen.numStr,
      org.scalacheck.Arbitrary.arbitrary[String])) { s =>
      normalize(s); true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, s"totality: $res")
  }
}
