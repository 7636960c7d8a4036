package graft.operators

import graft.SparkSpec

class CandidateStatsSpec extends SparkSpec {
  import spark.implicits._

  test("rawCollisions is the exact sum of C(bucket,2)") {
    // bucket sizes 3, 2, 1 → C(3,2)+C(2,2)+C(1,2) = 3+1+0 = 4
    val banded = Seq(
      (1L, 0, 100L), (2L, 0, 100L), (3L, 0, 100L),
      (4L, 0, 200L), (5L, 0, 200L),
      (6L, 1, 100L)).toDF("id", "tbl", "bucket")
    assert(CandidateStats.rawCollisions(banded, Seq("tbl", "bucket"), "spec") == 4L)
  }

  test("rawCollisions is 0 on an empty band table") {
    val empty = Seq.empty[(Long, Int, Long)].toDF("id", "tbl", "bucket")
    assert(CandidateStats.rawCollisions(empty, Seq("tbl", "bucket"), "spec") == 0L)
  }

  test("pairDegree divides by max(nDocs, 1)") {
    assert(CandidateStats.pairDegree(10L, 5L) == 2.0)
    assert(CandidateStats.pairDegree(10L, 0L) == 10.0) // no div-by-zero
  }
}
