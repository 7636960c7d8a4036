package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis over an edge list — damped PageRank by K synchronous
  * power-iteration steps, the canonical "iterative joins over a static
  * relation" shape (web-graph authority scoring, citation ranking,
  * crawl-frontier prioritization for a training-data pipeline).
  *
  * Scale posture: the edge list is scanned once per iteration and
  * shuffled on `src` for the contribution join and on `dst` for the
  * incoming sum — the same two exchanges GraphX's Pregel emits per
  * superstep. Ranks (one row per node) re-shuffle on the node key each
  * round; with edges pre-bucketed by src the contribution join becomes
  * shuffle-free. Per-node out-degree and the iteration count are the
  * only state. Each iteration ends in `localCheckpoint` — without it
  * the plan doubles per round and Catalyst re-optimizes an
  * exponentially growing tree (the q72 CC lesson); storage from the
  * previous round is released via [[Checkpoints.release]]. The two
  * driver-side scalars per round (node count once, dangling mass each
  * round) are single aggregate values, never row data.
  */
object Graph {

  /** K power-iteration steps of PageRank over `edges(src, dst)`.
    * Multi-edges act as weights (a node's contribution splits over edge
    * OCCURRENCES, not distinct targets). Dangling mass (nodes with no
    * out-edge) is redistributed uniformly, so total rank stays 1 every
    * round (asserted in spec). Returns (node, rank), staged to parquet so
    * no checkpoint storage outlives the call (the [[Dedup.stage]]
    * contract).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = nodes.count()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val dangling = ranks.join(deg, ranks("node") === deg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0))).first().getDouble(0)
      val incoming = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inr"))
      val next = nodes.join(incoming, Seq("node"), "left")
        .select(col("node"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("inr"), lit(0.0)) + lit(dangling / n))).as("rank"))
        .localCheckpoint()
      Checkpoints.release(ranks)
      ranks = next
    }
    val out = Dedup.stage(ranks, "pagerank")
    Checkpoints.release(ranks)
    Checkpoints.release(nodes)
    Checkpoints.release(deg)
    out
  }
}
