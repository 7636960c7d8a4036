package graft.operators

import graft.SparkSpec

/** Dataset.unpersist is a CacheManager call and does NOT free the RDD that
  * localCheckpoint persisted — verified here, because every iterative loop
  * in the repo (CC pointer jumping, BPE merges) relies on
  * Checkpoints.release to keep peak storage at one live table per loop.
  */
class CheckpointsSpec extends SparkSpec {

  test("Dataset.unpersist leaks localCheckpoint storage; release frees it") {
    def live = spark.sparkContext.getPersistentRDDs.size
    val base = live
    val ck = spark.range(100).toDF("x").localCheckpoint(true)
    assert(live == base + 1, "eager localCheckpoint must register one RDD")
    ck.unpersist(blocking = true)
    assert(live == base + 1,
      "Dataset.unpersist must NOT free checkpoint storage (if this ever " +
        "starts passing 0, Spark changed semantics and release can retire)")
    Checkpoints.release(ck)
    // release is non-blocking; poll briefly
    val deadline = System.currentTimeMillis + 10000
    while (live > base && System.currentTimeMillis < deadline) Thread.sleep(50)
    assert(live == base, "Checkpoints.release must free the checkpoint RDD")
  }

  test("release is a safe no-op on a non-checkpointed frame") {
    val df = spark.range(10).toDF("x")
    Checkpoints.release(df) // must not throw
    assert(df.count() == 10)
  }

  test("BPE training leaves no persistent RDDs behind") {
    import spark.implicits._
    val profile = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "n")
    val base = spark.sparkContext.getPersistentRDDs.size
    Bpe.trainMerges(profile, numMerges = 6)
    val deadline = System.currentTimeMillis + 10000
    def live = spark.sparkContext.getPersistentRDDs.size
    while (live > base && System.currentTimeMillis < deadline) Thread.sleep(50)
    assert(live == base, s"BPE leaked ${live - base} checkpoint RDDs")
  }

  test("connectedComponents leaves no persistent RDDs behind") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L), (7L, 8L), (8L, 9L))
      .toDF("a", "b")
    val base = spark.sparkContext.getPersistentRDDs.size
    Dedup.connectedComponents(pairs, "a", "b").count()
    val deadline = System.currentTimeMillis + 10000
    def live = spark.sparkContext.getPersistentRDDs.size
    while (live > base && System.currentTimeMillis < deadline) Thread.sleep(50)
    assert(live == base, s"CC leaked ${live - base} RDDs")
  }

  test("HITS leaves no persistent RDDs behind (3 checkpoints per iteration)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L), (5L, 2L))
      .toDF("src", "dst")
    val base = spark.sparkContext.getPersistentRDDs.size
    Graph.hits(edges, iters = 3).count()
    val deadline = System.currentTimeMillis + 10000
    def live = spark.sparkContext.getPersistentRDDs.size
    while (live > base && System.currentTimeMillis < deadline) Thread.sleep(50)
    assert(live == base, s"HITS leaked ${live - base} checkpoint RDDs")
  }
}
