package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: executes `SparkEntry.entry` (the driver's rows>0
  * check) and, optionally, named queries against a given sf dir —
  * `runMain graft.Smoke [sfDir] [queryName...]`. Prints row counts and the
  * first rows so a human can eyeball shapes quickly.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val entry = SparkEntry.entry(spark)
    entry.show(10, truncate = false)
    println(s"ENTRY_ROWS=${entry.count()}")

    val wanted = if (args.length > 1) args.drop(1).toSeq else Seq.empty
    wanted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.show(10, truncate = false)
      println(s"${name}_ROWS=${df.count()}")
    }
    spark.stop()
  }
}
