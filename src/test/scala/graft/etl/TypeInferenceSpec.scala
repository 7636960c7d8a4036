package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import DType._

/** Golden cases for every guess_type rule (reference
  * load_tables_daily.py:86–152) and lattice properties for the widening
  * meet (fixing the reference's fall-through holes, SURVEY.md §0.1).
  * The type domain has 8 elements, so the lattice laws are checked
  * exhaustively rather than by sampling.
  */
class TypeInferenceSpec extends SparkSpec {
  import TypeInference._

  test("0 and 1 are smallint (reference :125–126)") {
    assert(guessType("0") == SmallInt)
    assert(guessType("1") == SmallInt)
  }

  test("leading zero preserves ID strings as text (reference :128–129)") {
    assert(guessType("007") == Text)
    assert(guessType("0123456") == Text)  // MRN-style
    assert(guessType("0.5") == Num)       // leading-zero rule is integer-branch only (:127–129)
  }

  test("integer range thresholds (reference :131,:134)") {
    assert(guessType("32767") == SmallInt)
    assert(guessType("-32768") == SmallInt)
    assert(guessType("32768") == Int32)
    assert(guessType("2147483647") == Int32)
    assert(guessType("2147483648") == Int64)
    assert(guessType("-7") == SmallInt)
  }

  test("integers beyond representable ranges degrade instead of breaking narrow()") {
    assert(guessType("9000000000000000000") == Int64)   // fits long
    assert(guessType("1e19") == Num)                    // > long, fits decimal(38,18)
    assert(guessType("1e308") == Text)                  // beyond decimal → text
  }

  test("non-integer numerics are numeric (reference :138)") {
    assert(guessType("3.14") == Num)
    assert(guessType("1.5e3") == SmallInt) // 1500.0 == int(1500) → integer path, like the reference
    assert(guessType("901.5") == Num)
  }

  test("booleans (reference :86–87)") {
    Seq("true", "FALSE", "t", "F").foreach(s => assert(guessType(s) == Bool))
  }

  test("dates vs timestamps: midnight rule (reference :104–116)") {
    assert(guessType("2024-01-15") == DateD)
    assert(guessType("2024-01-15 00:00:00") == DateD)
    assert(guessType("2024-01-15 10:30:00") == Timestamp)
    assert(guessType("2024-01-15T10:30:00.123456") == Timestamp)
    assert(guessType("3/14/2024") == DateD)
    assert(guessType("3/14/2024 9:05") == Timestamp)
  }

  test("extended dateutil-style formats classify and narrow consistently") {
    // classification
    assert(guessType("2024.01.05") == DateD)
    assert(guessType("14.3.2024") == DateD)
    assert(guessType("March 14, 2024") == DateD)
    assert(guessType("14 Mar 2024") == DateD)
    assert(guessType("3/14/24") == DateD)
    assert(guessType("2024-01-01T10:00:00+05:00") == Timestamp)
    // offset at local midnight is still an instant, not a date
    assert(guessType("2024-01-01T00:00:00+05:00") == Timestamp)

    // narrow() must parse everything the classifier accepted
    import spark.implicits._
    val df = Seq(
      ("2024.01.05", "14.3.2024", "March 14, 2024", "14 Mar 2024", "3/14/24"))
      .toDF("dot_iso", "dot_eu", "word_full", "day_first", "yy")
    val typed = inferAndNarrow(df)
    assert(typed.schema.forall(_.dataType == DateType))
    val r = typed.first()
    assert(r.getDate(0).toString == "2024-01-05")
    assert(r.getDate(1).toString == "2024-03-14")
    assert(r.getDate(2).toString == "2024-03-14")
    assert(r.getDate(3).toString == "2024-03-14")
    assert(r.getDate(4).toString == "2024-03-14")
  }

  test("empty and junk are text") {
    assert(guessType("") == Text)
    assert(guessType("hello") == Text)
    assert(guessType("Brand#13") == Text)
  }

  test("numeric-looking date strings classify numeric first (reference order)") {
    assert(guessType("20240101") == Int32) // numeric wins over temporal
  }

  test("widening fixes the reference's lattice holes") {
    assert(meet(Set(DateD, SmallInt)) == Text)   // reference: silent text fall-through
    assert(meet(Set(DateD, Int32)) == Text)      // reference bug: returned integer
    assert(meet(Set(Bool, SmallInt)) == Text)    // reference bug: returned smallint
    assert(meet(Set(DateD, Timestamp)) == Timestamp)
    assert(meet(Set(SmallInt, Int32, Int64)) == Int64)
    assert(meet(Set(SmallInt, Num)) == Num)
    assert(meet(Seq.empty[DType]) == Text)
    assert(meet(Set(Num)) == Num)
  }

  test("widen is commutative, associative, idempotent (proper semilattice, exhaustive)") {
    for (a <- DType.all; b <- DType.all) assert(widen(a, b) == widen(b, a), s"$a $b")
    for (a <- DType.all; b <- DType.all; c <- DType.all)
      assert(widen(widen(a, b), c) == widen(a, widen(b, c)), s"$a $b $c")
    for (a <- DType.all) assert(widen(a, a) == a)
  }

  test("meet is order-independent (all 3-element sequences)") {
    for (a <- DType.all; b <- DType.all; c <- DType.all) {
      val s = Seq(a, b, c)
      assert(s.permutations.map(meet(_)).toSet.size == 1, s"$s")
    }
  }

  test("sample sizing matches reference thresholds (:269–280)") {
    assert(sampleSizeFor(20000) == 1000)
    assert(sampleSizeFor(7000) == 500)
    assert(sampleSizeFor(2000) == 500)
    assert(sampleSizeFor(800) == 800)
  }

  test("narrow() survives every shape guessType accepts (ANSI-cast hardening)") {
    import spark.implicits._
    // each value here is classified non-text by guessType but would throw
    // CAST_INVALID_INPUT under a plain ANSI cast to the inferred type.
    val df = Seq(
      ("2.0", "1.5e3", "3/14/2024", "2024/01/05", "Mar 14, 2024", "20240101T120000"),
      ("7", "12", "2024-01-01", "2024-02-02", "Jan 2, 2024", "20240301T000130"))
      .toDF("dec_int", "sci_int", "us_date", "slash_date", "word_date", "compact_ts")
    val typed = inferAndNarrow(df)
    val m = typed.schema.map(f => f.name -> f.dataType).toMap
    assert(m("dec_int") == ShortType)
    assert(m("sci_int") == ShortType)
    assert(m("us_date") == DateType)
    assert(m("slash_date") == DateType)
    assert(m("word_date") == DateType)
    assert(m("compact_ts") == TimestampType)
    val rows = typed.orderBy(col("dec_int")).collect()
    assert(rows.map(_.getShort(0)).toSeq == Seq(2, 7))
    assert(rows.map(_.getShort(1)).toSeq == Seq(1500, 12))
    assert(rows.head.getDate(2).toString == "2024-03-14")
    assert(rows.head.getDate(3).toString == "2024-01-05")
    assert(rows.head.getDate(4).toString == "2024-03-14")
    assert(rows.head.getTimestamp(5).toString == "2024-01-01 12:00:00.0")
  }

  test("narrow() degrades values the sample never saw to null instead of failing") {
    import spark.implicits._
    val df = Seq("1", "2", "3").toDF("i")
    // force a smallint narrowing, then feed a non-numeric value through it
    val dirty = Seq("4", "oops").toDF("i")
    val typed = narrow(dirty, Map("i" -> SmallInt))
    assert(typed.schema.head.dataType == ShortType)
    val vals = typed.collect().map(r => if (r.isNullAt(0)) None else Some(r.getShort(0)))
    assert(vals.toSet == Set(Some(4.toShort), None))
    assert(narrow(df, inferColumnTypes(df)).count() == 3)
  }

  test("inferAndNarrow types an all-text DataFrame") {
    import spark.implicits._
    val df = Seq(
      ("1", "007", "3.5", "true", "2024-01-01", "2024-01-01 10:00:00", "hello"),
      ("32768", "042", "2.0", "f", "2024-02-02", "2024-02-02 00:00:30", "x"))
      .toDF("i", "mrn", "n", "b", "d", "ts", "s")
    val typed = inferAndNarrow(df)
    val m = typed.schema.map(f => f.name -> f.dataType).toMap
    assert(m("i") == IntegerType)        // 1→smallint, 32768→integer → integer
    assert(m("mrn") == StringType)       // leading zeros stay text
    assert(m("n") == DecimalType(38, 18))
    assert(m("b") == BooleanType)
    assert(m("d") == DateType)
    assert(m("ts") == TimestampType)
    assert(m("s") == StringType)
    assert(typed.count() == 2)
    val row = typed.orderBy(col("i")).first()
    assert(row.getInt(0) == 1)
    assert(row.getString(1) == "007")
    assert(row.getBoolean(3))
  }
}
