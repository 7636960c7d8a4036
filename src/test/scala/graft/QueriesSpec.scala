package graft

/** Smoke for the driver contract: every registered query runs at sf0.001
  * and returns a sane shape; oracle keys are a subset of query keys.
  */
class QueriesSpec extends SparkSpec {

  // Queries whose correct result CAN be empty at tiny scale.
  private val mayBeEmpty = Set("q09_empty_clone", "q12_join_anti", "q20_except",
    "q36_minhash_pairs", "q37_simhash_pairs")

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names")
    }
  }

  test("q06 HLL estimate is within the sketch error bound of exact") {
    // approx_count_distinct defaults to rsd = 0.05; 3x rsd is a generous
    // deterministic bound (the sketch is seeded, so this is reproducible).
    val r = Queries.approxDistinct(spark, sf0001).first()
    val approx = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(exact > 0)
    val relErr = math.abs(approx - exact) / exact
    assert(relErr <= 0.15, s"HLL rel error $relErr (approx=$approx exact=$exact)")
  }

  test("q106 approx percentiles stay within GK rank error of the exact twin (q120)") {
    import org.apache.spark.sql.functions._
    // the exact baseline is the oracle-proven q120 result (hash-checked
    // against DuckDB quantile_cont by the driver), not a hand-rolled sort:
    // the sketch gate is pinned to CI ground truth
    val approx = Queries.approxPercentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Queries.exactPercentiles(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    approx.foreach { case (flag, (a50, a95)) =>
      val (e50, e95) = exact(flag)
      val n = li.filter(col("l_returnflag") === flag).count()
      // accuracy=1000 ⇒ GK rank error ≤ n/1000, +2 for the exact twin's
      // linear interpolation landing between two data points
      val err = n / 1000 + 2
      Seq(("p50", a50, e50), ("p95", a95, e95)).foreach { case (p, a, e) =>
        val between = li.filter(col("l_returnflag") === flag &&
          col("l_extendedprice") > math.min(a, e) &&
          col("l_extendedprice") < math.max(a, e)).count()
        assert(between <= err,
          s"$flag $p: approx=$a exact=$e, $between values apart > rank err $err (n=$n)")
      }
    }
  }

  test("q123 equi-depth buckets are balanced and non-overlapping") {
    import org.apache.spark.sql.functions._
    val h = Queries.equidepthHistogram(spark, sf0001).collect()
    assert(h.length == 8)
    val n = spark.read.parquet(s"$sf0001/lineitem.parquet").count()
    assert(h.map(_.getLong(1)).sum == n, "every row lands in exactly one bucket")
    // near-unique prices ⇒ each bucket within 2% of n/k
    h.foreach { r =>
      assert(math.abs(r.getLong(1) - n / 8.0) <= n * 0.02,
        s"bucket ${r.getInt(0)} holds ${r.getLong(1)} of $n")
    }
    // [lo, hi] ranges are ordered and disjoint across buckets
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2),
        s"overlap: bucket ${a.getInt(0)} hi ${a.getDouble(3)} vs next lo ${b.getDouble(2)}")
    }
  }

  test("q123 rank-arithmetic bounds equal a local sorted recount (r18 percentile swap)") {
    // r18 replaced the exact `percentile` aggregate with value-count rank
    // arithmetic (two-level prefix sum). The contract is unchanged: each
    // bound is the EXACT 0-based order statistic at rank i·(n−1)/8 — the
    // definition the oracle replays with row_number(). Recount locally.
    import org.apache.spark.sql.functions._
    val xs = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = xs.length.toLong
    val bounds = (1 until 8).map(i => xs((i * (n - 1) / 8).toInt))
      .map(b => math.rint(b * 10000) / 10000)
    val h = Queries.equidepthHistogram(spark, sf0001).collect()
      .sortBy(_.getInt(0))
    // recount buckets with the recomputed bounds: identical n_rows per bucket
    val expected = xs.groupBy(x => bounds.count(b => x > b)).map {
      case (bkt, vs) => bkt -> vs.length.toLong
    }
    h.foreach { r =>
      assert(expected(r.getInt(0)) == r.getLong(1),
        s"bucket ${r.getInt(0)}: got ${r.getLong(1)}, recount ${expected(r.getInt(0))}")
    }
  }

  test("q155 correlations are valid Pearson values and match a direct computation") {
    import org.apache.spark.sql.functions._
    val rows = Queries.correlationMatrix(spark, sf0001).collect()
    assert(rows.length == 6, "upper triangle of 4 columns is 6 pairs")
    rows.foreach { r =>
      val v = r.getDouble(2)
      assert(v >= -1.0 && v <= 1.0, s"(${r.getString(0)}, ${r.getString(1)}) r=$v")
    }
    // one pair recomputed from first principles (sum-of-products moments)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    val m = li.agg(count(lit(1)).cast("double").as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy")).first()
    val (n, sx, sy, sxy, sxx, syy) = (m.getDouble(0), m.getDouble(1), m.getDouble(2),
      m.getDouble(3), m.getDouble(4), m.getDouble(5))
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = rows.find(r => r.getString(0) == "l_quantity" &&
      r.getString(1) == "l_extendedprice").get.getDouble(2)
    assert(math.abs(got - expected) < 1e-5, s"corr $got vs recomputed $expected")
  }

  test("q156 winsorization clamps to the exact percentile bounds and clips ~2%") {
    import org.apache.spark.sql.functions._
    val rows = Queries.winsorizedValues(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, wMin, wMax) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      val (lo, hi) = (r.getLong(5), r.getLong(6))
      assert(wMin <= wMax)
      // clipping is bounded by the tail definition: at most ~1% each side
      // (interpolated percentiles; +2 covers the rounding of small groups)
      assert(lo <= n / 100 + 2 && hi <= n / 100 + 2,
        s"${r.getString(0)}: clipped $lo/$hi of $n exceeds the 1% tails")
      assert(lo + hi > 0 || n < 100, s"${r.getString(0)}: nothing clipped; vacuous")
    }
  }

  test("q157 regression slope/intercept match the closed-form moments") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_returnflag") === "A")
    val m = li.agg(
      covar_pop(col("l_extendedprice"), col("l_quantity")).as("cov"),
      var_pop(col("l_quantity")).as("vx"),
      avg(col("l_extendedprice")).as("my"), avg(col("l_quantity")).as("mx"))
      .collect()(0)
    val slope = m.getDouble(0) / m.getDouble(1)
    val icept = m.getDouble(2) - slope * m.getDouble(3)
    val got = Queries.regressionPerGroup(spark, sf0001).collect()
      .find(_.getString(0) == "A").get
    assert(math.abs(got.getDouble(2) - slope) < 1e-4,
      s"slope ${got.getDouble(2)} vs $slope")
    assert(math.abs(got.getDouble(3) - icept) < 1e-4)
    assert(got.getDouble(4) >= 0.0 && got.getDouble(4) <= 1.0, "r2 out of [0,1]")
  }

  test("q158 entropy is bounded by log2(n_distinct) and non-negative") {
    Queries.entropyProfile(spark, sf0001).collect().foreach { r =>
      val (nd, e) = (r.getLong(2), r.getDouble(3))
      assert(e >= 0.0, s"${r.getString(0)}: negative entropy $e")
      assert(e <= math.log(nd.toDouble) / math.log(2.0) + 1e-9,
        s"${r.getString(0)}: entropy $e exceeds log2($nd)")
    }
  }

  test("q159 mode is the true argmax per source") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val maxes = docs.groupBy("source", "lang").count()
      .groupBy("source").agg(max("count").as("mx")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Queries.modePerGroup(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet == maxes.keySet)
    rows.foreach { r =>
      assert(r.getLong(2) == maxes(r.getString(0)),
        s"${r.getString(0)}: mode count ${r.getLong(2)} != max ${maxes(r.getString(0))}")
    }
  }

  test("q160 chi-square stats are in range with the right dof") {
    val r = Queries.chiSquareIndependence(spark, sf0001).collect()(0)
    val (nLangsM1TimesNSourcesM1, chi2, v) =
      (r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(nLangsM1TimesNSourcesM1 == 4L * 19L, s"dof $nLangsM1TimesNSourcesM1")
    assert(chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0, s"cramers_v $v out of [0,1]")
  }

  test("q161 interpolation preserves observed days and bounds gap fills") {
    import org.apache.spark.sql.functions._
    val out = Queries.linearInterpolate(spark, sf0001)
    assert(out.filter(col("value_filled").isNull).count() == 0,
      "interpolation left nulls")
    // every gap fill lies within [min, max] of its user's observed values
    val bounds = Tables(spark, sf0001, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 4).as("dv"))
      .groupBy("user_id").agg(min("dv").as("lo"), max("dv").as("hi"))
    val bad = out.filter(col("was_gap") === 1)
      .join(bounds, "user_id")
      .filter(col("value_filled") < col("lo") - 1e-6 ||
        col("value_filled") > col("hi") + 1e-6)
      .count()
    assert(bad == 0, s"$bad interpolated values escape the observed range")
  }

  test("q162 PMI rows are adjacent-pair collocations satisfying the formula") {
    import org.apache.spark.sql.functions._
    val rows = Queries.pmiTerms(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 5), "support floor violated")
    // driver-side replay: bigrams from the raw text, positional marginals
    val bigrams = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).toLowerCase.split("\\s+").filter(_.nonEmpty))
      .filter(_.length >= 2)
      .flatMap(t => t.init.zip(t.tail))
    val nb = bigrams.length.toDouble
    val cAb = bigrams.groupBy(identity).map { case (k, v) => k -> v.length }
    val cL = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length }
    val cR = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length }
    rows.foreach { r =>
      val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(cAb.getOrElse((a, b), 0) == n,
        s"($a,$b) n_pair $n != adjacent count ${cAb.getOrElse((a, b), 0)}")
      val expected = math.log(n * nb / (cL(a).toDouble * cR(b))) / math.log(2.0)
      assert(math.abs(r.getDouble(3) - expected) < 1e-5,
        s"pmi ${r.getDouble(3)} vs $expected for ($a,$b)")
    }
  }

  test("q98 CMS estimates are overestimate-only and within eps*N of exact") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    val est = Queries.cmsTermCounts(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(tokens(col("text"))).as("tok"))
    val total = toks.count()
    val exact = toks.filter(col("tok").isin(est.keys.toSeq: _*))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (term, e) =>
      val ex = exact.getOrElse(term, 0L)
      assert(e >= ex, s"CMS must never underestimate: $term est=$e exact=$ex")
      assert(e <= ex + math.ceil(0.001 * total).toLong,
        s"CMS $term est=$e exceeds exact=$ex + eps*N")
    }
  }
}
