package graft

import org.apache.spark.sql.functions._

/** Semantic gates for the round-7 batch-2 operators (q110–q117): invariants
  * the DuckDB hash can't see (spine contiguity, permutation properties,
  * tokenizer completeness, planted DQ violations).
  */
class PipelineOpsSpec extends SparkSpec {

  test("q110 gapFill: per-user spine is contiguous and fill carries the last observation") {
    val out = Queries.gapFill(spark, sf0001).collect()
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val days = rows.map(_.getDate(1).toLocalDate).sorted
      // contiguous calendar: day count == span + 1
      val span = java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last)
      assert(days.length == span + 1, s"user $u spine has holes")
      // first day is never a gap (spine starts at an observed day)
      val first = rows.minBy(_.getDate(1).toLocalDate.toEpochDay)
      assert(first.getInt(3) == 0, s"user $u first day marked gap")
      // forward fill: value on a gap day equals the previous day's value
      val sortedRows = rows.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      sortedRows.sliding(2).foreach {
        case Array(prev, cur) if cur.getInt(3) == 1 =>
          assert(cur.getDouble(2) == prev.getDouble(2),
            s"user $u gap day ${cur.getDate(1)} not forward-filled")
        case _ =>
      }
    }
    assert(out.exists(_.getInt(3) == 1), "fixture has no gaps; test is vacuous")
  }

  test("q111 slidingWindows: every event is counted in exactly window/slide = 2 windows") {
    val total = Queries.slidingWindows(spark, sf0001)
      .agg(sum("n_events")).first().getLong(0)
    val events = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(total == 2 * events, s"hop coverage: $total != 2 * $events")
  }

  test("q112 dqReport: planted violations are each counted exactly once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dq").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val early = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    // customer 1 exists; order 99 references customer 42 (orphan).
    Seq((1L, "c1", 0L, 0.0, "SEG")).toDF(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq(
      (1L, 1L, "O", 10.0, ts, "1-URGENT"),            // clean
      (2L, 1L, "O", -5.0, ts, "1-URGENT"),            // nonpositive price
      (3L, 1L, "O", 10.0, null.asInstanceOf[java.sql.Timestamp], "1-URGENT"), // null date
      (99L, 42L, "O", 10.0, ts, "1-URGENT"))          // orphan custkey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq(
      (1L, 1L, 1L, 1L, 5.0, 100.0, 0.1, 0.0, "N", "O", ts),   // clean
      (1L, 1L, 1L, 2L, 99.0, 100.0, 0.1, 0.0, "N", "O", ts),  // quantity range
      (1L, 1L, 1L, 3L, 5.0, 100.0, 1.5, 0.0, "N", "O", ts),   // discount range
      (1L, 1L, 1L, 4L, 5.0, -1.0, 0.1, 0.0, "N", "O", ts),    // nonpositive price
      (1L, 1L, 1L, 5L, 5.0, 100.0, 0.1, 0.0, "N", "O", early),// ship before order
      (1L, 1L, 1L, 5L, 5.0, 100.0, 0.1, 0.0, "N", "O", ts),   // dup PK (one extra)
      (777L, 1L, 1L, 1L, 5.0, 100.0, 0.1, 0.0, "N", "O", ts)) // orphan orderkey
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Queries.dqReport(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Map(
      "orders_nonpositive_totalprice" -> 1L,
      "orders_null_orderdate" -> 1L,
      "orders_orphan_custkey" -> 1L,
      "lineitem_quantity_out_of_range" -> 1L,
      "lineitem_discount_out_of_range" -> 1L,
      "lineitem_nonpositive_price" -> 1L,
      "lineitem_ship_before_order" -> 1L,
      "lineitem_orphan_orderkey" -> 1L,
      "lineitem_dup_pk" -> 1L)
    assert(got == expected, s"got $got")
  }

  test("q112 dqReport: splits the fixture's real dirt from its clean checks") {
    // The synthetic generator reuses (l_orderkey, l_linenumber) and ships
    // lines before their order date — the report surfaces exactly those two
    // classes and nothing else. (Verified independently via DuckDB.)
    val got = Queries.dqReport(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 9)
    val dirty = Set("lineitem_dup_pk", "lineitem_ship_before_order")
    dirty.foreach(c => assert(got(c) > 0, s"$c should flag the fixture's dirt"))
    (got.keySet -- dirty).foreach(c => assert(got(c) == 0L, s"$c = ${got(c)}"))
  }

  test("q113 seededShuffle: shards partition the corpus, positions are 1..n per shard, deterministic") {
    val a = Queries.seededShuffle(spark, sf0001).collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(a.length == docs)
    assert(a.map(_.getLong(0)).distinct.length == docs, "doc lost or duplicated")
    a.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      val pos = rows.map(_.getInt(2)).sorted
      assert(pos.toSeq == (1 to rows.length).toSeq, s"shard $shard positions not 1..n")
    }
    // deterministic across runs
    val b = Queries.seededShuffle(spark, sf0001).collect()
    assert(a.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      b.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq)
    // and actually shuffled: within-shard order differs from doc_id order
    val shard0 = a.filter(_.getInt(1) == 0).sortBy(_.getInt(2)).map(_.getLong(0))
    assert(shard0.toSeq != shard0.sorted.toSeq, "mix left ids in insertion order")
  }

  test("q114 embeddingPool: pooled centroids are unit-norm per label") {
    val rows = Queries.embeddingPool(spark, sf0001).collect()
    val dim = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(size(col("embedding"))).first().getInt(0)
    rows.groupBy(_.getInt(0)).foreach { case (label, rs) =>
      assert(rs.length == dim, s"label $label missing dims")
      val ss = rs.map(r => r.getDouble(2) * r.getDouble(2)).sum
      // components are rounded to 4dp; norm error is bounded by dim * 1e-4
      assert(math.abs(ss - 1.0) < dim * 1e-4, s"label $label norm^2 = $ss")
    }
  }

  test("q115 pretokenize: the pattern partitions text completely (lossless concat)") {
    val pat = java.util.regex.Pattern.compile(
      "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r]+|[ \\t\\n\\r]+")
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").limit(25).collect().map(_.getString(0))
    texts.foreach { txt =>
      val m = pat.matcher(txt)
      val sb = new StringBuilder
      while (m.find()) sb.append(m.group())
      assert(sb.toString == txt, "pre-tokenizer dropped or reordered characters")
    }
  }

  test("q116 zscoreOutliers: returns the true global top-50 by |z|") {
    val out = Queries.zscoreOutliers(spark, sf0001).collect()
    assert(out.length == 50)
    val cutoff = out.map(r => math.abs(r.getDouble(3))).min
    // recompute z for all events; no excluded event may beat the cutoff
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sd"))
    val all = ev.join(stats, "event_type")
      .select(col("event_id"), abs((col("value") - col("mu")) / col("sd")).as("az"))
      .collect()
    val chosen = out.map(_.getLong(0)).toSet
    val excludedMax = all.filter(r => !chosen(r.getLong(0))).map(_.getDouble(1)).max
    assert(excludedMax <= cutoff + 1e-4,
      s"excluded |z| $excludedMax beats included cutoff $cutoff")
  }

  test("q117 funnel: stages are monotonically shrinking and stage 1 is exact") {
    val rows = Queries.funnel(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viewers = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows("1_view") == viewers)
    assert(rows("1_view") >= rows("2_click_after_view"))
    assert(rows("2_click_after_view") >= rows("3_purchase_after_click"))
    assert(rows("3_purchase_after_click") > 0, "fixture has no full conversions")
  }

  test("q128 cdcApply: deletes drop keys, updates win over inserts, payloads exact") {
    val out = Queries.cdcApply(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val base = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base.nonEmpty)
    base.foreach { case (k, price) =>
      if (k % 7 == 0) assert(!out.contains(k), s"key $k had a terminal D but survived")
      else if (k % 3 == 0) assert(out(k) == ("U", price + 10.0), s"key $k update lost")
      else assert(out(k) == ("I", price), s"key $k base insert mutated")
    }
    assert(out.keySet == base.keySet.filterNot(_ % 7 == 0), "extra keys materialized")
    assert(base.keys.exists(_ % 7 == 0), "fixture has no deletes; test is vacuous")
    assert(base.keys.exists(k => k % 3 == 0 && k % 7 != 0), "fixture has no surviving updates")
  }

  test("q129 madOutliers: med/mad are the true medians and the outlier count is exact") {
    val out = Queries.madOutliers(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    def median(xs: Array[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    assert(out.nonEmpty && out.length == ev.size)
    out.foreach { case (t, (n, med, mad, nOut)) =>
      val xs = ev(t)
      assert(n == xs.length)
      val trueMed = median(xs)
      val trueMad = median(xs.map(x => math.abs(x - trueMed)).sorted)
      assert(math.abs(med - trueMed) <= 1e-4 + 5e-5 * math.abs(trueMed), s"$t med")
      assert(math.abs(mad - trueMad) <= 1e-4 + 5e-5 * math.abs(trueMad), s"$t mad")
      val expected = xs.count(x => math.abs(x - trueMed) > 4.4478 * trueMad)
      assert(nOut == expected, s"$t outliers: got $nOut want $expected")
    }
    assert(out.map(_._2._4).sum > 0, "fixture has no MAD outliers; test is vacuous")
  }

  test("q131 intervalCoverage matches a brute-force sweep per user") {
    val out = Queries.intervalCoverage(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val iv = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts").cast("long").as("s"),
        (col("ts").cast("long") + (col("event_id") % 7 + 1) * 60).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(out.keySet == iv.keySet)
    var sawMerge = false
    iv.foreach { case (u, rows) =>
      val sorted = rows.map(x => (x._2, x._3)).sortBy(identity)
      // brute sweep: fold sorted intervals into disjoint islands
      val islands = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc @ ((s0, e0) :: rest), (s, e)) =>
          if (s <= e0) (s0, math.max(e0, e)) :: rest else (s, e) :: acc
        case (Nil, x) => List(x)
      }
      val (n, nIsl, cov) = out(u)
      assert(n == rows.size, s"user $u interval count")
      assert(nIsl == islands.size, s"user $u islands: got $nIsl want ${islands.size}")
      assert(cov == islands.map(i => i._2 - i._1).sum, s"user $u coverage")
      if (islands.size < rows.size) sawMerge = true
    }
    assert(sawMerge, "fixture has no overlapping intervals; test is vacuous")
  }

  test("q137 coOccurrence: top-20 matches a brute-force basket recount") {
    val got = Queries.coOccurrence(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 20)
    got.foreach { case (a, b, _) => assert(a < b, "pair must be ordered") }
    val baskets = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).values.map(_.map(_._2).sorted)
    val brute = baskets.flatMap(items =>
        for (i <- items.indices; j <- i + 1 until items.length) yield (items(i), items(j)))
      .groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
      .toSeq.sortBy(t => (-t._3, t._1, t._2)).take(20)
    assert(got.toSeq == brute, s"got ${got.toSeq.take(3)}..., brute ${brute.take(3)}...")
  }

  test("q138 sequenceMatch: counts equal a local regex replay and nest correctly") {
    val r = Queries.sequenceMatch(spark, sf0001).first()
    val (nUsers, conv, errFree, signup, errs) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val seqs = Tables(spark, sf0001, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1), x.getLong(2), x.getString(3)))
      .groupBy(_._1).map { case (_, es) =>
        es.sortBy(e => (e._2.getTime * 1000 + e._2.getNanos / 1000, e._3))
          .map(_._4.head).mkString
      }.toSeq
    assert(nUsers == seqs.length)
    def c(re: String) = seqs.count(s => re.r.findFirstIn(s).isDefined).toLong
    assert(conv == c("v.*c.*p"))
    assert(errFree == c("v[^e]*c[^e]*p"))
    assert(signup == c("^s"))
    assert(errs == c("ee"))
    assert(errFree <= conv, "the constrained pattern can never exceed the free one")
    assert(conv > 0 && errFree < conv,
      "fixture must have conversions AND at least one errored conversion")
  }

  test("q139 trailingWindow matches a brute-force trailing-hour recount") {
    val got = Queries.trailingWindow(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(4))).toMap
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("sec"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.size == ev.length)
    val byUser = ev.groupBy(_._1)
    var sawMultiRow = false
    ev.foreach { case (u, eid, sec, _) =>
      val frame = byUser(u).filter(e => e._3 >= sec - 3599 && e._3 <= sec)
      val (n, s) = got((u, eid))
      assert(n == frame.length, s"user $u event $eid: n_1h $n != ${frame.length}")
      assert(math.abs(s - frame.map(_._4).sum) < 1e-3, s"user $u event $eid sum")
      if (frame.length > 1) sawMultiRow = true
    }
    assert(sawMultiRow, "no event has trailing company; test is vacuous")
  }

  test("q140 snapshotDiff: classes partition the key space with the planted counts") {
    val rows = Queries.snapshotDiff(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val keys = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
    val added = keys.count(_ % 17 == 0).toLong
    val removed = keys.count(_ % 13 == 0).toLong
    val changed = keys.count(k => k % 13 != 0 && k % 11 == 0).toLong
    val unchanged = keys.length - removed - changed
    assert(rows("added")._1 == added)
    assert(rows("removed")._1 == removed)
    assert(rows("changed")._1 == changed)
    assert(rows("unchanged")._1 == unchanged)
    assert(rows("added")._3 < 0L, "synthetic inserts live in the negated (collision-free) range")
    assert(Seq(added, removed, changed).forall(_ > 0), "a planted class is empty; test is vacuous")
  }

  test("q141 temperatureSample: budgets and memberships replay exactly; temperature flattens") {
    val got = Queries.temperatureSample(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1)))
    def bucket(id: Long): Long = {
      val m31 = 2147483648L
      val x0 = (id + 42) % m31
      val m1 = (x0 * 2654435761L) % m31
      val x1 = m1 ^ (m1 >>> 15)
      val m2 = (x1 * 1597334677L) % m31
      (m2 ^ (m2 >>> 13)) % 10000
    }
    val bySource = docs.groupBy(_._2)
    val wsum = bySource.values.map(xs => math.pow(xs.size, 0.7)).sum
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (s, xs) =>
      val (nDocs, nTarget, threshold, nSampled) = got(s)
      assert(nDocs == xs.size)
      val expTarget = math.floor(BigDecimal(math.pow(xs.size, 0.7) / wsum * 1000.0)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
      assert(nTarget == expTarget, s"$s target")
      val expThr = math.min(10000L,
        math.floor(BigDecimal(nTarget * 10000.0 / xs.size)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong)
      assert(threshold == expThr, s"$s threshold")
      assert(nSampled == xs.count(d => bucket(d._1) < expThr), s"$s membership")
    }
    // temperature property: sampling RATE decreases with source size
    val rates = got.values.toSeq.filter(_._4 > 0)
      .map(v => (v._1, v._4.toDouble / v._1)).sortBy(_._1)
    assert(rates.nonEmpty && got.values.map(_._4).sum > 0)
    val sizes = bySource.values.map(_.size).toSet
    if (sizes.size > 1) {
      val small = rates.take(rates.size / 3).map(_._2).sum / math.max(rates.size / 3, 1)
      val large = rates.takeRight(rates.size / 3).map(_._2).sum / math.max(rates.size / 3, 1)
      assert(small >= large * 0.8,
        s"alpha<1 must not downsample small sources harder than large ($small vs $large)")
    }
  }

  test("q142 noveltyScore matches a local string-gram df recount") {
    val got = Queries.noveltyScore(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[String] = {
      val ts = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (0 to math.max(ts.length - 3, 0)).map(i => ts.slice(i, i + 3).mkString(" ")).toSet
    }
    val df = docs.flatMap(d => grams(d._2)).groupBy(identity).map { case (g, xs) => g -> xs.size }
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val gs = grams(text)
      val unique = gs.count(df(_) == 1)
      val (n, nov) = got(id)
      assert(n == gs.size, s"doc $id gram count")
      assert(math.abs(nov - unique.toDouble / gs.size) < 1e-4 + 1e-9, s"doc $id novelty")
    }
    assert(got.values.exists(_._2 > 0) && got.values.exists(_._2 < 1),
      "novelty is degenerate corpus-wide; test is vacuous")
  }

  test("q143 joinCardinality: histogram products equal the real join sizes") {
    val rows = Queries.joinCardinality(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
    val fk = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
    assert(rows("1_lineitem_orders_fk")._1 == fk, "FK prediction must be exact")
    val self = li.as("a").join(li.as("b"), col("a.l_partkey") === col("b.l_partkey")).count()
    assert(rows("2_lineitem_self_partkey")._1 == self, "self-join prediction must be exact")
    // the low-cardinality key is the blow-up case the diagnostic exists for
    val (pr, keys, _) = rows("3_orders_self_priority")
    assert(keys <= 5 && pr > ord.count() * 100,
      s"priority self-join should explode: $pr rows over $keys keys")
  }

  test("q144 cohortRetention: offset-0 equals cohort size; total activity conserved") {
    val rows = Queries.cohortRetention(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val activity = Tables(spark, sf0001, "events")
      .select(col("user_id"), expr("CAST(ts AS BIGINT) div 604800").as("week"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohortOf = activity.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    // every (user, active week) contributes exactly one cell count
    assert(rows.map(_._3).sum == activity.length)
    // offset 0 of each cohort = number of users whose first week it is
    val cohortSizes = cohortOf.values.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    rows.filter(_._2 == 0L).foreach { case (cw, _, n) =>
      assert(n == cohortSizes(cw), s"cohort $cw offset-0")
    }
    assert(rows.exists(_._2 > 0L), "no retention beyond week 0; test is vacuous")
    rows.foreach { case (_, off, _) => assert(off >= 0, "negative offset impossible") }
  }

  test("q145 tfidfCosinePairs matches a local sparse-cosine recount") {
    val got = Queries.tfidfCosinePairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 1000).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toDouble
    val tf = docs.map { case (id, text) =>
      id -> text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => t -> xs.length }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val w = tf.map { case (id, m) =>
      id -> m.map { case (t, f) => t -> f * math.log(n / df(t)) }
    }
    val nrm = w.map { case (id, m) => id -> math.sqrt(m.values.map(x => x * x).sum) }
    val brute = (for {
      (ia, wa) <- w.toSeq; (ib, wb) <- w.toSeq if ia < ib
      dot = wa.keySet.intersect(wb.keySet).toSeq.map(t => wa(t) * wb(t)).sum
      cos = BigDecimal(dot / (nrm(ia) * nrm(ib)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= 0.6
    } yield (ia, ib) -> cos).toMap
    assert(got.keySet == brute.keySet,
      s"missing ${brute.keySet -- got.keySet}, extra ${got.keySet -- brute.keySet}")
    brute.foreach { case (p, c) => assert(math.abs(got(p) - c) < 2e-4, s"$p cosine") }
    assert(brute.nonEmpty, "no qualifying sparse-cosine pairs; test is vacuous")
  }

  test("q146 survivorship: the survivor is each cluster's longest doc, id tie-break") {
    val got = Queries.survivorship(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.operators.Dedup.ngramJaccardAllPairs(
        spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // local union-find over the exact pair graph
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val members = parent.keys.toSeq.groupBy(find)
    assert(got.size == members.size, s"cluster count: ${got.size} vs ${members.size}")
    members.values.foreach { ms =>
      val best = ms.map(id => (docs(id), id)).sortBy(x => (-x._1, x._2)).head
      val cid = ms.min
      val (n, sid, schars) = got(cid)
      assert(n == ms.size, s"cluster $cid size")
      assert(sid == best._2 && schars == best._1, s"cluster $cid survivor")
      assert(ms.size >= 2, "edge-derived clusters have >= 2 members")
    }
    assert(members.values.exists(ms =>
      ms.map(docs).toSet.size > 1), "all clusters have uniform length; tie policy untested")
  }

  test("q147 conversionLag matches a local first-view/first-purchase recount") {
    val r = Queries.conversionLag(spark, sf0001).first()
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("sec"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val lags = ev.groupBy(_._1).values.flatMap { es =>
      val v = es.filter(_._2 == "view").map(_._3).minOption
      val p = es.filter(_._2 == "purchase").map(_._3).minOption
      (v, p) match {
        case (Some(fv), Some(fp)) if fp >= fv => Some(fp - fv)
        case _ => None
      }
    }.toSeq.sorted
    assert(lags.nonEmpty && lags.max > 0, "fixture has no nonzero conversion lags")
    assert(r.getLong(0) == lags.length, "converter count")
    def pct(q: Double): Double = {
      val pos = q * (lags.length - 1)
      val (lo, hi) = (lags(pos.toInt), lags(math.ceil(pos).toInt))
      lo + (hi - lo) * (pos - pos.toInt)
    }
    assert(math.abs(r.getDouble(1) - pct(0.5)) < 0.01 + 1e-9, "p50")
    assert(math.abs(r.getDouble(2) - pct(0.9)) < 0.01 + 1e-9, "p90")
    assert(r.getLong(3) == lags.max, "max lag")
  }
}
