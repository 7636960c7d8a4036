package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    Tables(spark, dir, "embeddings").count()
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime
      val pairs = graft.operators.Similarity.exactCosinePairs(
        Tables(spark, dir, "embeddings").filter(col("vec_id") < 2000), threshold = 0.35)
      val n = pairs.count()
      val t1 = System.nanoTime
      println(f"PAIRS=$n time=${(t1-t0)/1e9}%.2f")
      val cc = graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
      val m = cc.count()
      val t2 = System.nanoTime
      println(f"CC=$m time=${(t2-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
