package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.time.LocalTime
import java.time.format.{DateTimeFormatter, ResolverStyle}
import java.time.temporal.TemporalQueries
import scala.util.Try

/** Inferred logical column types — the reference's PG type vocabulary.
  *
  * Mirrors `guess_type` (reference load_tables_daily.py:118–152) and its
  * per-value detectors (:86–116). The widening lattice fixes the reference's
  * fall-through holes (`_determine_final_type`, load_tables_daily.py:307–327,
  * e.g. `{date, smallint}` silently widening to text) with a proper
  * commutative/associative/idempotent `widen` (property-tested).
  */
sealed abstract class DType(val name: String) extends Serializable
object DType {
  case object SmallInt  extends DType("smallint")
  case object Int32     extends DType("integer")
  case object Int64     extends DType("bigint")
  case object Num       extends DType("numeric")
  case object Bool      extends DType("boolean")
  case object DateD     extends DType("date")
  case object Timestamp extends DType("timestamp")
  case object Text      extends DType("text")

  val all: Seq[DType] =
    Seq(SmallInt, Int32, Int64, Num, Bool, DateD, Timestamp, Text)

  def fromName(n: String): DType =
    all.find(_.name == n).getOrElse(Text)

  /** Spark physical type for each inferred logical type. */
  def toSpark(t: DType): DataType = t match {
    case SmallInt  => ShortType
    case Int32     => IntegerType
    case Int64     => LongType
    case Num       => DecimalType(38, 18)
    case Bool      => BooleanType
    case DateD     => DateType
    case Timestamp => TimestampType
    case Text      => StringType
  }
}

object TypeInference {
  import DType._

  /** Pinned date/timestamp formats standing in for dateutil's lenient parser
    * (reference load_tables_daily.py:104–116). dateutil accepts open-ended
    * shapes; this pinned list covers every format the reference's 22
    * clinical extracts use plus the common interchange shapes dateutil would
    * also take (word months, European dots, offset timestamps, 2-digit
    * years), and being pinned makes inference deterministic (SURVEY.md §7
    * hard-part 1). KEEP IN LOCKSTEP with [[sparkTemporalFormats]] — every
    * format accepted here must be parseable by [[narrow]]'s cast path.
    */
  private val dateTimeFormats: Seq[DateTimeFormatter] = Seq(
    "uuuu-MM-dd['T'][' ']HH:mm:ss[.SSSSSS][.SSS]",
    "uuuu-MM-dd['T'][' ']HH:mm:ss[.SSS]XXX", // offset timestamps (ISO)
    "uuuu-MM-dd",
    "uuuu/MM/dd",
    "uuuu.MM.dd",
    "M/d/uuuu[ H:mm[:ss]]",
    "M/d/uu",                                // 2-digit year (dateutil default)
    "M-d-uuuu",
    "d.M.uuuu",                              // European dotted
    "MMM d, uuuu",
    "MMMM d, uuuu",                          // full month name
    "d MMM uuuu",
    "uuuuMMdd'T'HHmmss"
  ).map(p => DateTimeFormatter.ofPattern(p).withResolverStyle(ResolverStyle.STRICT))

  /** Parse attempt → Some(isMidnight). None = not temporal. Offset-bearing
    * strings are always timestamps: "midnight" in some zone is not a date
    * once normalized to the session zone.
    */
  private def parseTemporal(s: String): Option[Boolean] =
    dateTimeFormats.iterator.flatMap { f =>
      Try {
        val parsed = f.parse(s)
        val hasOffset = Option(parsed.query(TemporalQueries.offset())).isDefined
        val time = Option(parsed.query(TemporalQueries.localTime()))
        !hasOffset && time.forall(_ == LocalTime.MIDNIGHT)
      }.toOption
    }.nextOption()

  def isBool(s: String): Boolean =
    Set("true", "false", "t", "f").contains(s.toLowerCase)

  def isNumeric(s: String): Boolean =
    Try(s.trim.toDouble).toOption.exists(d => !d.isNaN && !d.isInfinite) &&
      // Python float() rejects hex/underscores; Scala toDouble rejects them
      // too, but accepts trailing 'd'/'f' suffixes — exclude those.
      !s.exists(c => c.isLetter && c != 'e' && c != 'E')

  def isInteger(s: String): Boolean =
    Try(s.trim.toDouble).toOption.exists(d => d == Math.floor(d) && !d.isInfinite)

  /** Per-value classifier — rule-for-rule mirror of guess_type
    * (load_tables_daily.py:118–152):
    *   - ""            → text        (:119–120)
    *   - "0"/"1"       → smallint    (:125–126, before the leading-zero rule)
    *   - leading zero  → text        (:128–129, preserves MRN-style IDs)
    *   - |v| ≤ 32767   → smallint    (:131)
    *   - |v| ≤ 2³¹−1   → integer     (:134)
    *   - other integer → bigint      (:136)
    *   - non-integer   → numeric     (:138)
    *   - true/false/t/f→ boolean     (:141–142)
    *   - temporal, midnight → date, else timestamp (:144–150)
    */
  def guessType(raw: String): DType = guessType(raw, lenient = false)

  /** [[guessType]] with the opt-in free-form date grammar: `lenient = true`
    * first canonicalizes word-month shapes ("March 4th, 2020") through
    * [[LenientTemporal.normalize]] — the deterministic stand-in for the
    * reference's dateutil leniency — and then classifies exactly as the
    * strict path does. Non-temporal values are untouched by normalize, so
    * every strict verdict is preserved.
    */
  def guessType(raw: String, lenient: Boolean): DType = {
    val s0 = raw.trim
    val s = if (lenient) LenientTemporal.normalize(s0) else s0
    if (s.isEmpty) return Text
    if (isNumeric(s)) {
      if (isInteger(s)) {
        if (s == "0" || s == "1") return SmallInt
        if (s.charAt(0) == '0') return Text
        val v = s.toDouble
        if (v >= -32768 && v <= 32767) SmallInt
        else if (v >= -2147483648.0 && v <= 2147483647.0) Int32
        // Beyond long range the reference still says "bigint"
        // (load_tables_daily.py:136 has no upper bound) and its ALTER then
        // fails at load time; we degrade to numeric while the value fits
        // DecimalType(38,18)'s 20 integer digits, else text — so narrow()
        // never feeds an unrepresentable value to an ANSI cast.
        else if (math.abs(v) <= 9.2e18) Int64
        else if (math.abs(v) < 1e20) Num
        else Text
      } else Num
    } else if (isBool(s)) Bool
    else parseTemporal(s) match {
      case Some(true)  => DateD
      case Some(false) => Timestamp
      case None        => Text
    }
  }

  /** Pairwise widening — a proper join-semilattice (top = Text).
    * Chains: smallint < integer < bigint < numeric < text;
    *         date < timestamp < text; boolean < text.
    * Cross-chain combinations widen to text (fixing the reference's
    * `{date, integer} → integer` surprise and the `{date, smallint} → text`
    * silent fall-through by making every combination explicit).
    */
  def widen(a: DType, b: DType): DType = {
    if (a == b) return a
    def rankNum(t: DType): Option[Int] = t match {
      case SmallInt => Some(0); case Int32 => Some(1)
      case Int64 => Some(2);    case Num => Some(3)
      case _ => None
    }
    def rankTemporal(t: DType): Option[Int] = t match {
      case DateD => Some(0); case Timestamp => Some(1); case _ => None
    }
    (rankNum(a), rankNum(b)) match {
      case (Some(x), Some(y)) => if (x >= y) a else b
      case _ =>
        (rankTemporal(a), rankTemporal(b)) match {
          case (Some(x), Some(y)) => if (x >= y) a else b
          case _                  => Text
        }
    }
  }

  /** Column vote resolution (reference `_determine_final_type`,
    * load_tables_daily.py:307–327) — ours is `reduce(widen)`, total and
    * order-independent. Empty vote (all-null column) stays text, matching
    * the reference's all-text default.
    */
  def meet(types: Iterable[DType]): DType =
    if (types.isEmpty) Text else types.reduce(widen)

  /** Adaptive sample sizing (load_tables_daily.py:269–280). */
  def sampleSizeFor(recordCount: Long): Int =
    if (recordCount > 10000) 1000
    else if (recordCount > 1000) 500
    else recordCount.toInt

  /** Bounded row-count probe for sample sizing: the thresholds only need
    * to distinguish ≤1000 / ≤10000 / more, so `limit(10001).count()` reads
    * at most 10 001 rows — versus the reference's full `count(*)`
    * (load_tables_daily.py:258), which at 100 TB is a full scan spent on
    * picking a sample size.
    */
  def boundedCount(df: DataFrame): Long = df.limit(10001).count()

  /** Sampled per-column inference (Q1/Q2/Q5/Q6/T3): take a bounded row
    * sample and vote every column in ONE aggregation job —
    * `df.limit(n).agg(vote(c1), vote(c2), …)` with [[TypeVoteAggregator]]
    * doing the per-value guess → widen reduction distributively (the lattice
    * is commutative/associative, so map-side partial votes are sound).
    *
    * The reference runs one `SELECT col WHERE col IS NOT NULL LIMIT n` per
    * column (load_tables_daily.py:287); a naive port launches one Spark job
    * per column — 500 job rounds on a 500-column extract, and each
    * `IS NOT NULL … LIMIT` probe can scan arbitrarily deep on a
    * mostly-null column. One bounded-sample job reads O(n) rows total
    * regardless of table size or column count. Null values inside the
    * sample are skipped by the vote (an all-null column stays text,
    * matching the reference's all-text default).
    */
  def inferColumnTypes(df: DataFrame, sampleRows: Option[Int] = None,
                       lenient: Boolean = false): Map[String, DType] = {
    if (df.columns.isEmpty) return Map.empty
    val n = sampleRows.getOrElse(sampleSizeFor(boundedCount(df)))
    val vote = udaf(if (lenient) LenientTypeVoteAggregator else TypeVoteAggregator)
    val aggCols = df.columns.map(c => vote(col(c).cast(StringType)).as(c))
    val row = df.limit(n).agg(aggCols.head, aggCols.tail.toSeq: _*).first()
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> DType.fromName(row.getString(i))
    }.toMap
  }

  /** The pinned format list of [[parseTemporal]] re-expressed in Spark's
    * datetime pattern syntax, for the narrowing cast. ISO shapes (incl. 'T'
    * separators, fractional seconds, and zone offsets) are covered by the
    * default `try_to_timestamp` parse; the rest are explicit. Single-letter
    * fields are width-lenient, matching the java.time patterns.
    */
  private val sparkTemporalFormats: Seq[String] = Seq(
    "yyyy/M/d", "yyyy.M.d",
    "M/d/yyyy H:mm:ss", "M/d/yyyy H:mm", "M/d/yyyy", "M/d/yy",
    "M-d-yyyy", "d.M.yyyy",
    "MMM d, yyyy", "MMMM d, yyyy", "d MMM yyyy",
    "yyyyMMdd'T'HHmmss")

  /** First successful parse across the pinned formats, null if none match —
    * the Spark-side mirror of [[parseTemporal]], so every string `guessType`
    * classifies as date/timestamp narrows without an ANSI cast error.
    */
  private def temporalParse(c: Column): Column =
    coalesce((try_to_timestamp(c) +:
      sparkTemporalFormats.map(f => try_to_timestamp(c, lit(f)))).toSeq: _*)

  /** D3 equivalent: one-shot functional cast rewrite instead of per-column
    * `ALTER COLUMN TYPE` mutations (load_tables_daily.py:296–305,422–426).
    * A single `select` keeps the whole narrowing inside one projection —
    * one pass over the data, fully codegen'd.
    *
    * Casts are inference-consistent, not plain ANSI casts: `guessType`
    * accepts integer-valued decimal/scientific strings ('2.0', '1.5e3') as
    * integral and non-ISO temporals ('3/14/2024') as date/timestamp, both of
    * which a direct ANSI `CAST` would reject at runtime. Integral targets
    * therefore route through a decimal intermediate (ANSI decimal→integral
    * truncates the fraction and only errors on overflow, which inference's
    * range rules already exclude) and temporals through the same pinned
    * format list inference used. `try_cast` semantics throughout: a value
    * the sample never saw degrades to null instead of failing the load —
    * the sampled-inference contract (SURVEY §7 hard-part 1).
    */
  def narrow(df: DataFrame, types: Map[String, DType],
             lenient: Boolean = false): DataFrame = {
    if (lenient) graft.functions.NativeTextExpressions.register(df.sparkSession)
    val cols: Seq[Column] = df.columns.toSeq.map { c =>
      types.get(c) match {
        case Some(t) if t != Text => narrowColumn(col(c), t, lenient).as(c)
        case _                    => col(c)
      }
    }
    df.select(cols: _*)
  }

  private def narrowColumn(c: Column, t: DType, lenient: Boolean): Column = {
    // lenient narrowing canonicalizes free-form shapes scan-locally (the
    // codegen'd `lenient_temporal_norm`) before the same strict cascade —
    // so the cast path accepts exactly what lenient inference voted DATE
    def temporal(col: Column) =
      temporalParse(if (lenient) call_function("lenient_temporal_norm", col) else col)
    t match {
      case SmallInt | Int32 | Int64 =>
        c.try_cast(DecimalType(38, 18)).try_cast(DType.toSpark(t))
      case Num       => c.try_cast(DecimalType(38, 18))
      case Bool      => c.try_cast(BooleanType)
      case DateD     => temporal(c).cast(DateType)
      case Timestamp => temporal(c)
      case Text      => c
    }
  }

  def inferAndNarrow(df: DataFrame, lenient: Boolean = false): DataFrame =
    narrow(df, inferColumnTypes(df, lenient = lenient), lenient)

  /** S6/D6: schema report DataFrame (column_name, inferred_type) — the
    * Spark analogue of data-type-pandas.py:15–31's `TABLE,COLUMN,TYPE` dump
    * and build_query's information_schema probe (vertica_upload.py:237–243).
    */
  def schemaReport(df: DataFrame, sampleRows: Option[Int] = None): Seq[(String, String)] =
    inferColumnTypes(df, sampleRows).toSeq
      .map { case (c, t) => (c, t.name) }
      .sortBy(_._1)

  /** D6 — DDL generation: emit a `CREATE TABLE` statement for a DataFrame's
    * schema, the analogue of `build_query`'s cross-engine DDL
    * (vertica_upload.py:245–283, including its `text→varchar` style type
    * rewrite — here the rewrite is Spark-type → SQL-type). Column order
    * follows the DataFrame; names are backtick-quoted.
    */
  def ddlFor(df: DataFrame, table: String): String = {
    val cols = df.schema.map { f =>
      val sqlType = f.dataType.sql
      s"`${f.name}` $sqlType"
    }
    s"CREATE TABLE IF NOT EXISTS `$table` (${cols.mkString(", ")})"
  }
}
