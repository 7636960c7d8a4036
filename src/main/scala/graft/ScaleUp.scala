package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: materialize an sf1-SHAPED slice (10× the sf0.1 rows in the
  * corpus tables) so the scaling claims argued from design can be
  * MEASURED one decade up — the driver only generates up to sf0.1.
  *
  * Shape model: ten disjoint replicas with constant local density — the
  * way real corpora grow (near-dup/neighbor density stays constant as a
  * corpus scales; ten independent shards of sf0.1 density give exactly
  * that, with 10× the qualifying pairs of sf0.1 as the known ground
  * truth for linearity). Naive replication would instead create
  * ten-member exact-duplicate clusters of every row — quadratic pair
  * blowup BY CONSTRUCTION, which measures the synthetic corpus, not the
  * plan. Per table:
  *
  *  - documents: ids offset per replica; every token suffixed with a
  *    replica tag, so each replica keeps sf0.1's exact within-replica
  *    near-dup structure (token identity is what every text kernel —
  *    shingles, tf-idf, minhash — consumes) while cross-replica
  *    vocabulary is disjoint (cosine/Jaccard exactly 0 across replicas).
  *  - embeddings: ids offset; dimensions cyclically rotated per replica
  *    (rotation preserves all within-replica inner products bit-for-bit
  *    and decorrelates cross-replica cosines for generic vectors).
  *  - events: event/user ids offset — 10× users over the same window.
  *  - lineitem: order AND part keys offset (TPC-H grows both with sf),
  *    so the co-purchase graph becomes ten disjoint sf0.1 graphs: 10×
  *    edges, 10× triangles, unchanged degree distribution.
  *
  * Writes to /tmp/graft-sf1 (never under /root/testdata — read-only).
  * Usage: `sbt "runMain graft.ScaleUp"`, then bench the heavy family:
  * `SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 SPARK_GRAFT_BENCH_ONLY=q145_tfidf_cosine,...
  *  sbt "runMain graft.Bench"`.
  */
object ScaleUp {
  val IdStride = 10000000L

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    // replica count is the scale knob: 10 → sf1-shaped, 50 → sf5-shaped
    // (250k docs — past the broadcast gates, i.e. the shuffle regime)
    val Replicas = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String, perReplica: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$srcDir/$name.parquet")
      val out = (0 until Replicas).map(r => perReplica(base, r)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"$name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }

    replicate("documents", (df, r) => df.select(
      (col("doc_id") + lit(r * IdStride)).as("doc_id"),
      // replica 0 is sf0.1 verbatim; others tag every token. n_chars is
      // recomputed so the metadata column stays consistent with text.
      (if (r == 0) col("text")
       else regexp_replace(col("text"), "(\\S+)", s"$$1~r$r")).as("text"),
      col("lang"), col("source")
    ).withColumn("n_chars", length(col("text")).cast("long")))

    replicate("embeddings", (df, r) => {
      val dim = 64 // rotation amount varies per replica; slice handles any dim
      val shift = (r * 7) % dim
      val rotated =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, 10000),
          slice(col("embedding"), 1, shift))
      df.select((col("vec_id") + lit(r * IdStride)).as("vec_id"),
        rotated.as("embedding"), col("label"))
    })

    replicate("events", (df, r) => df.select(
      (col("event_id") + lit(r * 100L * IdStride)).as("event_id"),
      col("ts"),
      (col("user_id") + lit(r * IdStride)).as("user_id"),
      col("event_type"), col("value"), col("props")))

    replicate("lineitem", (df, r) => df.select(
      (col("l_orderkey") + lit(r * IdStride)).as("l_orderkey"),
      (col("l_partkey") + lit(r * IdStride)).as("l_partkey"),
      col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))

    // the small dims the bench warm-up touches ride along unscaled
    Seq("region", "nation", "customer", "supplier", "part", "orders").foreach { n =>
      spark.read.parquet(s"$srcDir/$n.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$n.parquet")
    }
    spark.stop()
  }
}
