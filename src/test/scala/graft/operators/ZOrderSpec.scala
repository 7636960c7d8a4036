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
}
