package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * Scale design: the query set is always the small side — broadcast it and
  * make a single scan over the corpus compute all query×corpus scores, then
  * per-query top-k via `Window` + rank (which Spark executes as a partial
  * top-k per partition under AQE). The corpus is never self-joined: cost is
  * O(|corpus| × |queries|) FLOPs on one pass, which is the right baseline
  * at 100 TB. The LSH variant cuts the scanned fraction by bucketing both
  * sides on random-hyperplane sign bits.
  */
object Similarity {

  /** Exact brute-force top-k neighbors for each query vector.
    * `queries` must be small (broadcast); self-matches excluded. The score
    * is the codegen'd native [[graft.functions.CosineSimilarity]] — one
    * fused loop per pair instead of the HOF composition's intermediate
    * arrays (identical double-precision result).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("corpus_vec"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        VectorFunctions.cosine("query_vec", "corpus_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"),
        col("rk").cast("int").as("rk"))
  }

  /** Deterministic random hyperplanes for sign-bit LSH (seeded). */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH bucket id: sign bit per plane, folded to a long.
    * Vectors with high cosine land in the same bucket with probability
    * (1 - θ/π)^planes — the classic SRP-LSH guarantee.
    */
  private def bucketExpr(vecCol: String, planes: Seq[Seq[Double]]) = {
    val bits = planes.map { p =>
      val planeArr = array(p.map(lit): _*)
      val dot = aggregate(
        zip_with(col(vecCol), planeArr, (x, h) => x * h),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L)).otherwise(lit(0L))
    }
    bits.foldLeft(lit(0L)) { (acc, b) => acc * 2 + b }
  }

  /** ANN top-k: bucket corpus and queries by SRP-LSH, join on bucket, rank
    * within. Trades recall for a ~2^planes reduction in scanned pairs; at
    * 100 TB the bucket join is a hash shuffle on a long key instead of a
    * broadcast fan-out of every query to every corpus row.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int = 4,
              dim: Int = 64, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val planes = hyperplanes(dim, numPlanes)
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("corpus_vec"),
      bucketExpr(vecCol, planes).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      bucketExpr(vecCol, planes).as("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        VectorFunctions.cosine("query_vec", "corpus_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** IVF-flat ANN: partition the corpus into inverted lists by nearest
    * coarse centroid, then search only the `nprobe` lists whose centroids
    * are closest to the query. Centroids here are a deterministic sample of
    * the corpus (ids < numCentroids) — the degenerate-but-real IVF variant
    * when no trained k-means codebook is available; swap in trained
    * centroids without changing the plan shape. At scale: one pass to
    * assign lists (broadcast centroids), then each query scans
    * nprobe/numCentroids of the corpus instead of all of it.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numCentroids: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val centroids = corpus.filter(col(idCol) < numCentroids)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

    // assign every corpus vector to its nearest centroid (one scan,
    // broadcast centroids, per-row top-1 via max_by on (sim, centroid)).
    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("corpus_vec"))
      .join(broadcast(centroids))
      .withColumn("sim_c", VectorFunctions.cosine("corpus_vec", "centroid_vec"))
      .groupBy(col("neighbor_id"))
      .agg(max_by(struct(col("corpus_vec"), col("centroid_id")), col("sim_c")).as("best"))
      .select(col("neighbor_id"), col("best.corpus_vec").as("corpus_vec"),
        col("best.centroid_id").as("list_id"))

    // per query: the nprobe nearest centroid lists.
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
      .join(broadcast(centroids))
      .withColumn("sim_c", VectorFunctions.cosine("query_vec", "centroid_vec"))
      .withColumn("rk_c", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim_c").desc, col("centroid_id"))))
      .filter(col("rk_c") <= nprobe)
      .select(col("query_id"), col("query_vec"), col("centroid_id").as("list_id"))

    // search only the probed lists.
    val scored = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", VectorFunctions.cosine("query_vec", "corpus_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"),
        col("rk").cast("int").as("rk"))
  }

  /** All-pairs above a cosine threshold via LSH buckets (embedding-cosine
    * near-duplicate detection) — bucket self-join, never a full cross join.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double, numPlanes: Int = 6,
                         dim: Int = 64, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val planes = hyperplanes(dim, numPlanes)
    val b = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      bucketExpr(vecCol, planes).as("bucket"))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosine("v_a", "v_b"))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
      .dropDuplicates("id_a", "id_b")
  }
}
