package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries can run
    * (used by the GROUPING SETS query and ad-hoc SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
