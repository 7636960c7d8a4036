package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: for each named query (default: all), prints wall-clock over
  * `runs` executions and the formatted physical plan — the artifact used to
  * check scan pruning (PushedFilters/ReadSchema), join strategies
  * (broadcast vs shuffle), and WholeStageCodegen coverage before trusting a
  * query at scale. `runMain graft.PlanAudit [sfDir] [runs] [query...]`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"=== $name  runs=${times.map(t => f"$t%.2f").mkString(",")}s")
      if (sys.env.get("PLAN_AUDIT_EXPLAIN").contains("1"))
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
