package graft.operators

import graft.SparkSpec

/** The window-based frontier must equal the O(n²) dominance definition
  * on every input, including ties on either or both dimensions.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Int, Double)]): Set[(Int, Double)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (bx, by) =>
        bx >= x && by <= y && (bx > x || by < y)
      }
    }.toSet

  private def frontier(pts: Seq[(Int, Double)]): Seq[(Int, Double)] =
    Skyline.frontier2D(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq

  test("matches brute-force dominance on a mixed cloud") {
    val pts = Seq(1 -> 5.0, 2 -> 4.0, 2 -> 6.0, 3 -> 4.5, 4 -> 4.0,
      4 -> 7.0, 5 -> 9.0, 6 -> 8.0, 6 -> 12.0, 7 -> 11.0)
    assert(frontier(pts).toSet == brute(pts))
  }

  test("coincident frontier points all survive (no strict dominance)") {
    val pts = Seq(3 -> 2.0, 3 -> 2.0, 3 -> 2.0, 1 -> 1.0, 5 -> 5.0)
    val f = frontier(pts)
    assert(f.count(_ == (3 -> 2.0)) == 3, s"duplicates collapsed: $f")
    assert(f.toSet == brute(pts))
  }

  test("a single dominating point leaves a frontier of one") {
    val pts = Seq(10 -> 1.0, 1 -> 2.0, 5 -> 3.0, 9 -> 1.5)
    assert(frontier(pts) == Seq(10 -> 1.0))
  }

  test("randomized equality with heavy ties (seeded)") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(300)((rnd.nextInt(8), (rnd.nextInt(8) + 1).toDouble))
    assert(frontier(pts).toSet == brute(pts))
    assert(frontier(pts).size == {
      val b = brute(pts)
      pts.count(b.contains) // multiplicity preserved
    })
  }
}
