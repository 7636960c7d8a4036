package graft.operators

import graft.SparkSpec

/** The bin-bucketed overlap join must equal the naive O(n²) definition,
  * with the overlap-start bin assignment emitting each pair exactly
  * once — including pairs straddling bin boundaries and touching
  * endpoints.
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def brute(as: Seq[(Long, Long, Long)], bs: Seq[(Long, Long, Long)])
  : Set[(Long, Long)] =
    (for {
      (ia, sa, ea) <- as
      (ib, sb, eb) <- bs
      if sa <= eb && sb <= ea
    } yield (ia, ib)).toSet

  private def joined(as: Seq[(Long, Long, Long)], bs: Seq[(Long, Long, Long)],
                     bin: Long): Seq[(Long, Long)] =
    Intervals.overlapJoin(
        as.toDF("id_a", "s_a", "e_a"), bs.toDF("id_b", "s_b", "e_b"), bin)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("matches brute force across bin boundaries, exactly once per pair") {
    val as = Seq((1L, 0L, 50L), (2L, 90L, 210L), (3L, 100L, 100L),
      (4L, 199L, 201L), (5L, 300L, 400L))
    val bs = Seq((10L, 40L, 60L), (11L, 95L, 105L), (12L, 100L, 300L),
      (13L, 401L, 500L), (14L, 0L, 1000L))
    for (bin <- Seq(1L, 7L, 100L, 1000L)) {
      val got = joined(as, bs, bin)
      assert(got.toSet == brute(as, bs), s"bin=$bin: wrong pair set")
      assert(got.size == got.toSet.size, s"bin=$bin: duplicate pairs emitted")
    }
  }

  test("touching endpoints are inclusive overlaps; disjoint pairs are not") {
    val got = joined(Seq((1L, 0L, 100L)), Seq((2L, 100L, 200L), (3L, 101L, 200L)), 60L)
    assert(got == Seq((1L, 2L)), s"inclusive-bound semantics broken: $got")
  }

  test("randomized equality with interval lengths around the bin size (seeded)") {
    val rnd = new scala.util.Random(99)
    def mk(n: Int, off: Long) = (1 to n).map { i =>
      val s = rnd.nextInt(5000).toLong
      (off + i, s, s + rnd.nextInt(150))
    }
    val as = mk(120, 0L)
    val bs = mk(120, 1000L)
    val got = joined(as, bs, 100L)
    assert(got.toSet == brute(as, bs))
    assert(got.size == got.toSet.size, "duplicate pairs emitted")
  }
}
