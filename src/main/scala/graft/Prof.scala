package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage profiler for the weighted prefix join (dev
  * tool; not part of the driver surface).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.functions.NativeTextExpressions.register(spark)
    val docs = Tables(spark, sfDir, "documents")
    val nDocs = time("count")(docs.count()).toDouble
    val terms = docs
      .select(col("doc_id").as("id"),
        explode(filter(split(lower(col("text")), "\\s+"), x => length(x) > 0)).as("term"))
      .select(col("id"), xxhash64(col("term")).as("tok"))
    val tf = terms.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = tf.join(dfT, "tok")
      .select(col("id"), col("tok"), col("df"),
        (col("tf") * log(lit(nDocs) / col("df"))).as("w"))
    val norms = w.groupBy(col("id")).agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val unit = w.join(norms, "id").filter(col("nrm") > 0)
      .select(col("id"), col("tok"), col("df"), (col("w") / col("nrm")).as("u"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("tok"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val tailsDf = unit.withColumn("tail", sqrt(sum(col("u") * col("u")).over(byRarity)))
    val dir = s"/tmp/prof-tails-${spark.sparkContext.applicationId}"
    time("tails-stage") { tailsDf.write.mode("overwrite").parquet(dir) }
    val tails = spark.read.parquet(dir)
    println(s"PROF tails rows=${tails.count()}")
    val posting = tails.filter(col("tail") >= threshold)
      .select(col("id"), col("tok"), col("tail"))
    println(s"PROF posting rows=${time("posting-count")(posting.count())}")
    val cands = posting.as("a").join(posting.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          col("a.tail") * col("b.tail") >= threshold - 1e-9)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    println(s"PROF cands rows=${time("cands-count")(cands.count())}")
    val vdir = s"/tmp/prof-vecs-${spark.sparkContext.applicationId}"
    time("vecs-stage") {
      tails.groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("tok"), col("u")))).as("kv"))
        .select(col("id"),
          transform(col("kv"), x => x.getField("tok")).as("ks"),
          transform(col("kv"), x => x.getField("u")).as("vs"))
        .write.mode("overwrite").parquet(vdir)
    }
    val vecs = spark.read.parquet(vdir)
    val verified = cands
      .join(broadcast(vecs.select(col("id").as("id_a"), col("ks").as("ka"), col("vs").as("va"))), "id_a")
      .join(broadcast(vecs.select(col("id").as("id_b"), col("ks").as("kb"), col("vs").as("vb"))), "id_b")
      .withColumn("cosine", round(expr("sorted_dot(ka, va, kb, vb)"), 4))
      .filter(col("cosine") >= threshold)
    println(s"PROF verified rows=${time("verify-count")(verified.count())}")
    // raw posting-pair volume (pre-dedup) — the shuffle the candidate path pays
    val raw = posting.as("a").join(posting.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          col("a.tail") * col("b.tail") >= threshold - 1e-9)
    println(s"PROF raw-posting-pairs=${time("raw-count")(raw.count())}")
    // brute-force alternative: broadcast nested-loop all-pairs over the
    // staged vectors, cosine computed in the projection (arrays never shuffle)
    println(s"PROF vecs-partitions=${vecs.rdd.getNumPartitions} cands-partitions=${cands.rdd.getNumPartitions}")
    val bnl = vecs.repartition(128).as("x").join(
        broadcast(vecs.select(col("id").as("id_b"), col("ks").as("kb"), col("vs").as("vb"))),
        col("x.id") < col("id_b"))
      .select(col("x.id").as("id_a"), col("id_b"),
        round(expr("sorted_dot(ks, vs, kb, vb)"), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
    println(s"PROF bnl rows=${time("bnl-count")(bnl.count())}")
    println(s"PROF bnl rerun=${time("bnl-count2")(bnl.count())}")
    spark.stop()
  }
}
