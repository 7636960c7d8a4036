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
