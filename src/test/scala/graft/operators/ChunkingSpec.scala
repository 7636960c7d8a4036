package graft.operators

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  // 12 tokens → with size=5, stride=4: starts 0,4,8 → windows of 5,5,4
  private val docs = Seq(
    (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"),
    (2L, "short doc"),
    (3L, ""),
    (4L, "   \t  "))
    .toDF("doc_id", "text")

  test("windows cover every token with the configured overlap") {
    val out = Chunking.tokenWindows(docs, "doc_id", "text", size = 5, stride = 4)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Int, Int, String)].collect()
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3)).toSeq == Seq((0, 5), (1, 5), (2, 4)))
    assert(d1(0)._4 == "t0 t1 t2 t3 t4")
    assert(d1(1)._4 == "t4 t5 t6 t7 t8") // stride 4 < size 5 ⇒ 1-token overlap
    assert(d1(2)._4 == "t8 t9 t10 t11")
    // every token appears in some chunk
    val covered = d1.flatMap(_._4.split(" ")).toSet
    assert(covered == (0 until 12).map(i => s"t$i").toSet)
  }

  test("short docs yield one clipped chunk; empty docs yield none") {
    val out = Chunking.tokenWindows(docs, "doc_id", "text", size = 5, stride = 4)
      .as[(Long, Int, Int, String)].collect()
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 2, "short doc")))
    assert(!out.exists(_._1 == 3L), "empty doc must produce no chunks")
    assert(!out.exists(_._1 == 4L), "whitespace-only doc must produce no chunks")
  }

  test("chunk ids are layout-independent") {
    val a = Chunking.tokenWindows(docs, "doc_id", "text", size = 5, stride = 4)
    val b = Chunking.tokenWindows(docs.repartition(7), "doc_id", "text", size = 5, stride = 4)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
