package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels each component with its min id") {
    // two components {1,2,3} (path) and {5,6}; 7 appears only as a pair
    // with itself-absent — vertices come from pairs, so no singleton rows
    val pairs = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("long chains converge (diameter > 2 rounds)") {
    val chain = (0L until 8L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(chain, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(out.length == 8)
    assert(out.forall(_._2 == 0L), "all 8 chain vertices must share cluster 0")
  }

  test("cluster labels are canonical: every label is a member of its cluster") {
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L), (30L, 10L)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect()
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (label, members) =>
      assert(members.map(_._1).contains(label), s"label $label not a member")
      assert(members.map(_._1).min == label, s"label $label is not the min id")
    }
  }
}
