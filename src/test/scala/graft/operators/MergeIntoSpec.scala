package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  test("every MERGE action lands: update, predicate-delete, insert, untouched") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val source = Seq(
      (1L, "a2", 11.0),   // matched → update
      (2L, "b", -1.0),    // matched + deleteCond → delete
      (9L, "new", 90.0))  // unmatched → insert
      .toDF("k", "name", "v")
    val out = MergeInto.mergeInto(target, source, "k", deleteCond = col("v") < 0)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(out == Map(
      1L -> ("a2", 11.0),   // updated
      3L -> ("c", 30.0),    // untouched
      9L -> ("new", 90.0))) // inserted; 2 deleted
  }

  test("schema mismatch is rejected up front") {
    val target = Seq((1L, "a")).toDF("k", "name")
    val source = Seq((1L, 2.0)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      MergeInto.mergeInto(target, source, "k")
    }
  }

  test("row conservation on the real dimension: |merged| = |target| - deletes + inserts") {
    val cust = graft.Tables(spark, sf0001, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val upd = cust.filter(col("c_custkey") % 5 === 0)
      .withColumn("c_acctbal", col("c_acctbal") - 5000)
    val ins = cust.filter(col("c_custkey") % 7 === 0)
      .select((-col("c_custkey")).as("c_custkey"), col("c_nationkey"),
        lit(1111.11).as("c_acctbal"))
    val merged = MergeInto.mergeInto(cust, upd.unionByName(ins), "c_custkey",
      deleteCond = col("c_acctbal") < 0)
    val deleted = upd.filter(col("c_acctbal") < 0).count()
    assert(merged.count() == cust.count() - deleted + ins.count())
    assert(deleted > 0 && ins.count() > 0, "fixture exercises no deletes/inserts")
    // merged keys are unique — the MERGE contract's output side
    assert(merged.select("c_custkey").distinct().count() == merged.count())
  }
}
