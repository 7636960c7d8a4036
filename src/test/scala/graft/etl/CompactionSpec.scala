package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compaction: file count drops to the byte-derived target, content is
  * byte-identical, the swap is atomic (no .compact/.precompact leftovers),
  * and an already-compact directory is a no-op.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  private def parquetFiles(dir: String): Array[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName)

  test("compaction reduces files, preserves content exactly, cleans up") {
    val dir = freshDir("compact")
    val src = (0 until 5000).map(i => (i.toLong, s"doc $i", i % 7)).toDF("id", "txt", "k")
    src.repartition(64).write.parquet(dir) // 64 tiny files
    assert(parquetFiles(dir).length == 64)
    val report = Compaction.compactParquet(spark, dir, targetBytes = Long.MaxValue)
    assert(report.filesBefore == 64)
    assert(report.filesAfter == 1, s"expected 1 file, got ${report.filesAfter}")
    assert(report.rows == 5000)
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "compaction must not lose, duplicate, or mangle a single row")
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.endsWith(".compact") || n.endsWith(".precompact")),
      s"staging dirs must not survive the swap: ${parent.mkString(",")}")
  }

  test("deleteWhere removes exactly the matching rows; null predicate keeps the row") {
    val dir = freshDir("delete")
    Seq((1L, Some("en")), (2L, Some("de")), (3L, None), (4L, Some("en")))
      .toDF("id", "lang").write.parquet(dir)
    val r = Compaction.deleteWhere(spark, dir, "lang <> 'en'")
    assert(r.rowsDeleted == 1 && r.rowsRemaining == 3,
      s"only the 'de' row matches (null must be kept): $r")
    val ids = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L))
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.endsWith(".delete") || n.endsWith(".predelete")),
      s"staging dirs must not survive: ${parent.mkString(",")}")
  }

  test("an already-compact directory is a no-op") {
    val dir = freshDir("compact-noop")
    (0 until 100).map(i => (i.toLong, s"d$i")).toDF("id", "txt")
      .coalesce(1).write.parquet(dir)
    val before = parquetFiles(dir).toSet
    val report = Compaction.compactParquet(spark, dir, targetBytes = Long.MaxValue)
    assert(report.filesBefore == 1 && report.filesAfter == 1 && report.rows == 100)
    assert(parquetFiles(dir).toSet == before, "no-op must not rewrite files")
  }
}
