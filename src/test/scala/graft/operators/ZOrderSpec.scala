package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits; Column and SQL forms agree") {
    // a=0b101, b=0b011 → z bits (hi→lo) b2 a2 b1 a1 b0 a0 = 011011 = 27
    val r = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.zvalue($"a", $"b", 8).as("z"),
        expr(ZOrder.zvalueSql("a", "b", 8)).as("zs"))
      .first()
    assert(r.getLong(0) == 27L)
    assert(r.getLong(1) == 27L)
  }

  test("zvalue is injective over the bit range") {
    val n = (0 until 32).flatMap(a => (0 until 32).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
      .select(ZOrder.zvalue($"a", $"b", 5).as("z"))
      .distinct().count()
    assert(n == 1024)
  }

  test("z-order layout clusters BOTH dimensions; single-dim sorts do not") {
    // orders at sf0.001: ~150 customers × ~2400 days. Z-order works on
    // comparable bit widths, so the wider dimension is bucketed first
    // (day/16 → 8 bits, matching custkey's) — the documented contract.
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val keyed = o.select(col("o_custkey"),
        (datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
          / 16).cast("long").as("day_b"))
      .withColumn("z", ZOrder.zvalue(col("o_custkey"), col("day_b")))
    def avgWidths(order: Column): (Double, Double) = {
      val r = keyed
        .withColumn("f", ntile(16).over(Window.orderBy(order)))
        .groupBy("f")
        .agg((max("o_custkey") - min("o_custkey")).as("wc"),
          (max("day_b") - min("day_b")).as("wd"))
        .agg(avg("wc"), avg("wd")).first()
      (r.getDouble(0), r.getDouble(1))
    }
    val (zc, zd) = avgWidths(col("z"))
    val (dc, _) = avgWidths(col("day_b"))     // date-clustered (arrival-ish) layout
    val (_, cd) = avgWidths(col("o_custkey")) // single-dim customer sort
    // per-file ranges: z-order must beat each single-dim layout by 2x on
    // the dimension that layout ignores
    assert(zc < dc / 2, s"z custkey width $zc vs date-layout $dc")
    assert(zd < cd / 2, s"z day width $zd vs custkey-layout $cd")
  }

  private def deinterleave(z: Long, bits: Int): (Long, Long) = {
    var (a, b) = (0L, 0L)
    (0 until bits).foreach { i =>
      a |= ((z >> (2 * i)) & 1L) << i
      b |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (a, b)
  }

  test("decomposeBox covers EXACTLY the box — exhaustive over the 5-bit domain") {
    val bits = 5
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 8) {
      val Seq(xlo, xhi) = Seq.fill(2)(rnd.nextInt(32).toLong).sorted
      val Seq(ylo, yhi) = Seq.fill(2)(rnd.nextInt(32).toLong).sorted
      val ivs = ZOrder.decomposeBox(xlo, xhi, ylo, yhi, bits)
      // intervals sorted and disjoint
      ivs.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 + 1 < l2 || ivs.size == 1)
        case _ => ()
      }
      (0L until 1024L).foreach { z =>
        val (x, y) = deinterleave(z, bits)
        val inBox = x >= xlo && x <= xhi && y >= ylo && y <= yhi
        val inIvs = ivs.exists { case (lo, hi) => z >= lo && z <= hi }
        assert(inBox == inIvs,
          s"z=$z (x=$x, y=$y) box=[$xlo,$xhi]x[$ylo,$yhi]: inBox=$inBox inIvs=$inIvs")
      }
    }
  }

  test("coarsen bounds the interval count and only ever widens the union") {
    val ivs = ZOrder.decomposeBox(30, 90, 1096, 1460, 16)
    val coarse = ZOrder.coarsen(ivs, 32)
    assert(coarse.size <= 32 && ivs.size > 32)
    ivs.foreach { case (lo, hi) =>
      assert(coarse.exists { case (clo, chi) => clo <= lo && hi <= chi },
        s"coarsen dropped [$lo, $hi]")
    }
  }

  test("q149: z-layout reads fewer zones than EITHER single-dimension layout") {
    val (cLo, cHi, dLo, dHi) = graft.Queries.zzBox
    val n = 64
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val base = o.select(col("o_custkey").cast("long").as("ck"),
      datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
        .cast("long").as("day"))
    def zonesRead(keyed: org.apache.spark.sql.DataFrame, key: String,
                  hit: (Long, Long) => Boolean): Long = {
      ZoneMap.manifest(ZoneMap.withShard(keyed, key, n), key)
        .collect().count(r => hit(r.getLong(1), r.getLong(2)))
    }
    val readCust = zonesRead(base, "ck", (mn, mx) => mx >= cLo && mn <= cHi)
    val readDay = zonesRead(base, "day", (mn, mx) => mx >= dLo && mn <= dHi)
    val ivs = graft.Queries.zzIntervals
    val readZ = zonesRead(
      base.withColumn("zval", ZOrder.zvalue(col("ck"), col("day"), 16)), "zval",
      (mn, mx) => ivs.exists { case (lo, hi) => mx >= lo && mn <= hi })
    assert(readZ < readCust && readZ < readDay,
      s"z-layout read $readZ zones vs custkey $readCust, day $readDay")
    // and the composed query's soundness invariant on real data
    val rows = graft.Queries.zorderZoneMap(spark, sf0001).collect()
    rows.foreach { r =>
      if (r.getLong(5) == 0L)
        assert(r.getLong(4) == 0L, s"zone ${r.getLong(0)} skipped but matches")
    }
    assert(rows.exists(_.getLong(5) == 0L), "nothing skipped; test is vacuous")
    assert(rows.map(_.getLong(4)).sum ==
      base.filter(col("ck").between(cLo, cHi) && col("day").between(dLo, dHi)).count(),
      "per-zone match counts must add up to the true box count")
  }
}
