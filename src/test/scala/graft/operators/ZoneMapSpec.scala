package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private val n = 8
  private def layoutDir = new java.io.File(
    System.getProperty("java.io.tmpdir"), s"graft-test-zonemap-${System.nanoTime()}")

  // keys 0..999 with locality (already clustered), a realistic zone-map input
  private def table = (0L until 1000L).map(k => (k, s"payload-$k")).toDF("k", "v")

  test("withShard covers 0 until n, is total, and preserves key locality") {
    val sharded = ZoneMap.withShard(table, "k", n)
    assert(sharded.count() == 1000, "sharding must not drop rows")
    val m = ZoneMap.manifest(sharded, "k").orderBy("zshard").collect()
    assert(m.map(_.getLong(0)).toSeq == (0L until n).toSeq)
    assert(m.map(_.getLong(3)).sum == 1000)
    // fixed-width ranges over a clustered key: shard ranges are disjoint
    m.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) < b.getLong(1),
        s"shard ${a.getLong(0)} max ${a.getLong(2)} overlaps next min ${b.getLong(1)}")
    }
  }

  test("scanRange equals full-scan-filter and physically reads only surviving shards") {
    val dir = layoutDir
    try {
      val sharded = ZoneMap.withShard(table, "k", n)
      ZoneMap.writeLayout(sharded, dir.getAbsolutePath)
      val manifest = ZoneMap.manifest(sharded, "k")
      val (lo, hi) = (250L, 400L) // spans shards 2 and 3 of [0,1000)/8
      val pruned = ZoneMap.scanRange(spark, dir.getAbsolutePath, manifest, "k", lo, hi)
      val expected = table.filter(col("k") >= lo && col("k") <= hi)
      assert(pruned.select("k", "v").except(expected).isEmpty &&
        expected.except(pruned.select("k", "v")).isEmpty,
        "pruned scan must equal full scan + filter")
      // the physical proof: only files under the surviving shard dirs are read
      val filesRead = pruned.select(input_file_name()).distinct()
        .collect().map(_.getString(0)).toSet
      assert(filesRead.nonEmpty)
      assert(filesRead.forall(f => f.contains("zshard=2") || f.contains("zshard=3")),
        s"read outside surviving shards: $filesRead")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("scanRange with a predicate outside the domain reads nothing") {
    val dir = layoutDir
    try {
      val sharded = ZoneMap.withShard(table, "k", n)
      ZoneMap.writeLayout(sharded, dir.getAbsolutePath)
      val manifest = ZoneMap.manifest(sharded, "k")
      assert(ZoneMap.scanRange(spark, dir.getAbsolutePath, manifest, "k", 5000L, 6000L)
        .count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  test("manifests are mergeable: manifest(A union B) == merge(manifest(A), manifest(B))") {
    val a = (0L until 600L).map(k => (k, s"a-$k")).toDF("k", "v")
    val b = (400L until 1000L).map(k => (k, s"b-$k")).toDF("k", "v")
    // shard against the SAME key domain (0..999) so assignments align
    val all = ZoneMap.withShard(a.union(b), "k", n)
    val direct = ZoneMap.manifest(all, "k")
      .orderBy("zshard").collect().map(_.toSeq)
    // per-batch manifests over each batch's slice of the shared sharding
    val ma = ZoneMap.manifest(all.filter(col("v").startsWith("a-")), "k")
    val mb = ZoneMap.manifest(all.filter(col("v").startsWith("b-")), "k")
    val merged = ZoneMap.mergeManifests(ma, mb)
      .orderBy("zshard").collect().map(_.toSeq)
    assert(merged.toSeq == direct.toSeq,
      "merged per-batch manifests must equal the full-scan manifest")
    // overlap region forces real min/max/count merging, not concatenation
    assert(ma.count() > 0 && mb.count() > 0)
    val sharedShards = ma.select("zshard").intersect(mb.select("zshard")).count()
    assert(sharedShards > 0, "batches share no shard; merge untested")
  }

  test("q133 skipping soundness: every skipped shard has zero matching rows") {
    val rows = graft.Queries.zoneMapSkipping(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      if (r.getLong(5) == 0L)
        assert(r.getLong(4) == 0L, s"shard ${r.getLong(0)} skipped but has matches")
    }
    assert(rows.exists(_.getLong(5) == 0L), "predicate skips nothing; test is vacuous")
    assert(rows.exists(_.getLong(4) > 0L), "predicate matches nothing; test is vacuous")
  }
}
