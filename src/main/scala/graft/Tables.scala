package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * The reference derives table names from CSV file names
  * (load_tables_daily.py:345); here the analogous mapping is
  * `name -> s"$dir/$name.parquet"`. All reads go through the vectorized
  * parquet reader so column pruning / predicate pushdown reach the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
      // rejects; read nanos as long and convert with exact integer division
      // (a double roundtrip would lose sub-µs bits at 2024-epoch magnitudes).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries can run
    * (used by the GROUPING SETS query and ad-hoc SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
