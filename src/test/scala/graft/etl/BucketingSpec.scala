package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Extends OperatorsSpec's shuffle-free bucketed-join plan check with the
  * cases it doesn't cover: real testdata tables, forced sort-merge (no
  * broadcast escape hatch), result equality vs the plain join, and the
  * aggregation path (bucketed groupBy must also skip its exchange).
  */
class BucketingSpec extends SparkSpec {

  private def withSqlConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed SMJ with broadcast disabled: no exchange, same result") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey").cast("long").as("custkey"),
        col("o_orderkey"), col("o_totalprice"))
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_custkey").cast("long").as("custkey"), col("c_name"))
    try {
      TableLifecycle.publishBucketed(orders, "b_orders", 8, Seq("custkey"))
      TableLifecycle.publishBucketed(customer, "b_customer", 8, Seq("custkey"))
      // disable broadcast so the planner has to prove co-partitioning
      // rather than sidestep it; AQE off so the initial plan is what runs
      withSqlConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val joined = spark.table("b_orders").join(spark.table("b_customer"), "custkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle; plan:\n$plan")
        val expected = orders.join(customer, Seq("custkey")).count()
        assert(joined.count() == expected)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("groupBy on the bucket key also skips the shuffle") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey").cast("long").as("custkey"), col("o_totalprice"))
    try {
      TableLifecycle.publishBucketed(orders, "b_orders_agg", 8, Seq("custkey"))
      withSqlConf("spark.sql.adaptive.enabled" -> "false") {
        val agg = spark.table("b_orders_agg")
          .groupBy("custkey").agg(sum("o_totalprice").as("total"))
        val plan = agg.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed groupBy must not shuffle; plan:\n$plan")
        assert(agg.count() == orders.select("custkey").distinct().count())
      }
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
