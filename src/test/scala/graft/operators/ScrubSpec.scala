package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII scrubbing: each pattern redacts its shape and nothing else; the
  * IP-before-digit-run order is honored; hit counts match redactions.
  */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("emails, IPs and card-shaped digit runs redact; short numbers survive") {
    val rows = Seq(
      (1L, "write to alice.smith+tag@sub.example.co.uk today"),
      (2L, "server at 192.168.1.254 port 8080"),
      (3L, "card 4111111111111111 expires 12/26"),
      (4L, "version 1.2.3 of lib, 42 items, year 2026"),
      (5L, "multi: a@b.io and c@d.org plus 10.0.0.1")
    ).toDF("doc_id", "text")
    val out = Scrub.scrubPii(rows, "text").collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getString(1))).toMap
    assert(out(1L) == (1, "write to <EMAIL> today"))
    assert(out(2L) == (1, "server at <IP> port 8080"))
    assert(out(3L) == (1, "card <NUM> expires 12/26"))
    // 1.2.3 is not 4 octets; 42/2026/8080 are short; 12/26 untouched
    assert(out(4L) == (0, "version 1.2.3 of lib, 42 items, year 2026"))
    assert(out(5L) == (3, "multi: <EMAIL> and <EMAIL> plus <IP>"))
  }

  test("an IPv4 address is one <IP>, never digit-run fragments") {
    val out = Scrub.scrubbed(lit("x 255.255.255.255 y"))
    val s = spark.range(1).select(out.as("t")).head().getString(0)
    assert(s == "x <IP> y")
  }

  test("scrubbing is scan-local: no exchange in the plan") {
    val df = Scrub.scrubPii(Seq((1L, "a@b.io")).toDF("doc_id", "text"), "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrub must not shuffle:\n$plan")
  }
}
