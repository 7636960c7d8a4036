package graft.etl

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** CSV ingest (reference S1–S4, F1, F3, F4).
  *
  * The reference shells out to `psql \COPY` / `vsql COPY` subprocesses
  * (load_tables_daily.py:508–559) after creating all-text tables from the
  * header row (:154–180). In Spark both collapse into one declarative read:
  * the vectorized CSV reader is the bulk path, and "all columns text" is
  * just an explicit all-String schema — no DDL, no subprocess, no
  * row-at-a-time INSERT fallback (:182–203) to get wrong.
  */
object Ingest {

  /** F3 — table-name normalization (`filename.replace(".csv","").lower()`,
    * load_tables_daily.py:345).
    */
  def tableNameFor(fileName: String): String = {
    val base = fileName.substring(fileName.lastIndexOf('/') + 1)
    base.replaceAll("(?i)\\.csv$", "").toLowerCase
  }

  /** S1+S2+D1 — header-aware CSV scan with every column as StringType,
    * mirroring phase 1 of the reference's two-phase schema lifecycle
    * (create-all-text at load_tables_daily.py:167, narrow later at :266–327).
    * An explicit schema (rather than inferSchema) keeps this a single pass
    * and defers typing to [[TypeInference.inferAndNarrow]], whose rules
    * (leading-zero IDs, smallint thresholds) differ from Spark's inference.
    */
  def readCsvAllText(spark: SparkSession, path: String): DataFrame = {
    val header = spark.read.option("header", "true").csv(path).schema
    val allText = StructType(header.map(f => StructField(f.name, StringType, nullable = true)))
    spark.read.option("header", "true").schema(allText).csv(path)
  }

  /** F4 — `load_time` audit column (vertica_upload.py:114,132–134). */
  def withLoadTime(df: DataFrame): DataFrame =
    df.withColumn("load_time", current_timestamp())

  /** F1 — raw-zone backup: copy source files to `history/upload_{date}/`
    * before load (load_tables_daily.py:205–215,329–338). Uses the Hadoop
    * FileSystem API so the same code works against HDFS/S3 on a cluster,
    * not just the local FS.
    */
  def backupFiles(spark: SparkSession, files: Seq[String], historyDir: String,
                  date: LocalDate = LocalDate.now()): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val stamp = date.format(DateTimeFormatter.ofPattern("uuuu_MM_dd"))
    val destDir = new Path(s"$historyDir/upload_$stamp")
    val fs = destDir.getFileSystem(conf)
    fs.mkdirs(destDir)
    files.map { f =>
      val src = new Path(f)
      val dst = new Path(destDir, src.getName)
      FileUtil.copy(src.getFileSystem(conf), src, fs, dst, false, true, conf)
      dst.toString
    }
  }

  /** JSON-lines ingest — the second text source format next to CSV. Same
    * two-phase stance: read with Spark's schema inference off the table
    * (all values as string via a text read + from_json would lose arrays),
    * so here we accept Spark's JSON inference and hand the result to
    * [[TypeInference.narrow]] only when columns came back as strings.
    */
  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** JSON-lines sink — the interchange format LLM-pipeline corpora ship in
    * (one JSON object per line, newline-safe: Spark's JSON writer escapes
    * embedded newlines/quotes/unicode, so arbitrary document text
    * round-trips losslessly). Plain distributed write — one file per
    * partition, no driver materialization.
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Write `df` as JSONL and read it back with the ORIGINAL schema pinned
    * (no inference round-trip: JSON cannot distinguish int widths, and a
    * column that is all-null in some shard would otherwise infer away).
    * This is the lossless-interchange contract the roundtrip query (q80
    * family) hash-checks end-to-end against the parquet original.
    */
  def roundtripJsonLines(df: DataFrame, path: String): DataFrame = {
    writeJsonLines(df, path)
    df.sparkSession.read.schema(df.schema).json(path)
  }

  /** F2 — manifest-driven file list (`files.list`, vertica_upload.py:334–339).
    * One small text file read driver-side; blank lines and `#` comments
    * skipped.
    */
  def readManifest(spark: SparkSession, manifestPath: String): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(manifestPath), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(manifestPath))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toList
    finally in.close()
  }
}
