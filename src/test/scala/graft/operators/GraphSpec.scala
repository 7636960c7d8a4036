package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("pageRank: 2-cycle stays uniform at every iteration count") {
    for (k <- Seq(1, 3, 5)) {
      val r = ranksOf(Seq((1L, 2L), (2L, 1L)), k)
      assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12,
        s"iters=$k: $r")
    }
  }

  test("pageRank: dangling node matches the hand-computed synchronous update") {
    // a→b, b dangles. n=2, r0=(.5,.5); dangling=.5
    // r1(a) = .15/2 + .85*(0  + .25) = .2875
    // r1(b) = .15/2 + .85*(.5 + .25) = .7125
    val r = ranksOf(Seq((1L, 2L)), 1)
    assert(math.abs(r(1L) - 0.2875) < 1e-12, s"got ${r(1L)}")
    assert(math.abs(r(2L) - 0.7125) < 1e-12, s"got ${r(2L)}")
  }

  test("pageRank: total rank is conserved at 1 and hubs outrank spokes") {
    // star: 1..5 all point at 9; 9 points back at 1
    val edges = (1L to 5L).map(i => (i, 9L)) :+ (9L, 1L)
    val r = ranksOf(edges, 3)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass leaked: ${r.values.sum}")
    assert(r(9L) > r(1L) && r(1L) > r(2L), s"authority order wrong: $r")
    assert(math.abs(r(2L) - r(5L)) < 1e-12, "symmetric spokes must tie")
  }

  test("pageRank: multi-edges act as weights") {
    // 1 sends twice to 2 and once to 3: 2 gets 2/3 of 1's contribution
    val r = ranksOf(Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)), 1)
    val third = 1.0 / 3
    val expected2 = 0.15 * third + 0.85 * (third * 2.0 / 3)
    val expected3 = 0.15 * third + 0.85 * (third * 1.0 / 3)
    assert(math.abs(r(2L) - expected2) < 1e-12, s"got ${r(2L)} want $expected2")
    assert(math.abs(r(3L) - expected3) < 1e-12, s"got ${r(3L)} want $expected3")
  }

  test("pageRank leaves no persistent RDDs behind") {
    val out = Graph.pageRank(Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"), 3)
    out.count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "checkpoint storage outlived pageRank")
  }
}
