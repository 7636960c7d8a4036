package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Parse the `SPARK_GRAFT_CONF` regime string (`k=v;k=v`). A malformed
    * entry fails NAMING the offending pair and the expected format — a
    * bare destructuring bind would throw an opaque MatchError that points
    * at nothing (a scale run's regime pin silently half-applied is worse
    * than a crash, and a crash that doesn't name the typo'd entry wastes
    * the run either way).
    */
  private[graft] def parseConfPairs(s: String): Seq[(String, String)] =
    s.split(";").map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => (k.trim, v)
        case _ => throw new IllegalArgumentException(
          s"SPARK_GRAFT_CONF entry '$kv' is malformed: expected " +
            "semicolon-separated key=value pairs, e.g. " +
            "\"spark.graft.bandJoin.broadcastRows=0;spark.graft.broadcastBytes=8388608\"")
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pin UTC like Verify/Smoke/PlanAudit: normalizeEventTs casts
      // TIMESTAMP_NTZ through the session zone, so an unpinned bench on
      // a non-UTC machine would time different instants than verify
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOG_LEVEL", "WARN"))
    // Regime injection for scale runs (tools/scale_run.md): semicolon-
    // separated k=v pairs applied to the session conf before any query
    // plans — e.g. SPARK_GRAFT_CONF="spark.graft.bandJoin.broadcastRows=0;
    // spark.graft.broadcastBytes=8388608" forces the shuffle regime the
    // way the plan-shape specs do, without editing code.
    sys.env.get("SPARK_GRAFT_CONF").foreach(parseConfPairs(_).foreach { case (k, v) =>
      spark.conf.set(k, v)
      System.err.println(s"bench: conf $k=$v")
    })
    // Warm-up: touch every table once (footer reads, codegen JIT, the
    // events nanos-schema path) so the first timed query doesn't absorb
    // one-time session costs that no steady-state workload pays.
    Tables.names.foreach { n =>
      try Tables(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    // Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and reports
    // the fastest run: the first execution pays one-time plan compilation
    // and codegen JIT that no steady-state workload pays, and on a shared
    // machine a single sample is noise-dominated (observed 3-4× swings on
    // identical code). Min-of-N is the standard steady-state estimator;
    // 3 samples because host stall windows measured at ~10 s have
    // swallowed BOTH samples of a min-of-2 on a normally sub-second
    // query (PLANS.md round-11 third-session adjudication).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val calBefore = Calibration.measure(3)
    // Optional comma-separated subset (dev tool): bench only these queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(q => s(q._1)))
    // A run that throws must NOT count as a (near-instant) timing — a broken
    // query would otherwise bench as a speedup. Min is taken over successful
    // runs only; a query with zero successes reports -1 and bumps `failed`.
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"bench: $name failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
          None
        }
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val failed = results.count(_._2 < 0)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // Host-drift denominator (r15 adjudication hinged on same-session
    // A/Bs because the host drifted 1.2–2.2× across sessions): one
    // fixed CPU-bound reference kernel, min-of-3 like the queries,
    // sampled BEFORE and AFTER the query loop so a mid-run host shift
    // is visible. Readers cite wall/calibration, not wall.
    val calAfter = Calibration.measure(3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"calibration":$calBefore,"calibration_after":$calAfter,"queries":$qs,"sf":"$sfDir"}""")
    // The harness that captures this output keeps only a bounded tail of
    // stdout; the full per-query line above is larger than that window, so
    // its head (metric/value) gets truncated away. Emit a second, compact
    // summary as the LAST line — total, failure count, and the slowest
    // queries, rounded — small enough to always survive a tail capture.
    def r3(v: Double) = math.rint(v * 1000) / 1000
    val slowest = results.toSeq.filter(_._2 >= 0).sortBy(-_._2).take(8)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","failed":$failed,"calibration":${r3(calBefore)},"calibration_after":${r3(calAfter)},"queries_n":${results.size},"slowest":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
