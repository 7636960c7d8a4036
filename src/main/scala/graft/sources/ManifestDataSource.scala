package graft.sources

import graft.etl.Ingest
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.util

/** DataSource V2 provider for the reference's manifest files
  * (`files.list` / `files_quart.list`, vertica_upload.py:334–358): each
  * line is a CSV file path; rows come back as (file_path, table_name) with
  * the reference's name normalization applied. Usage:
  *
  * {{{
  * spark.read.format("graft.sources.ManifestDataSource")
  *   .option("path", "/data/files.list").load()
  * }}}
  *
  * A complete V2 implementation: TableProvider → Table → ScanBuilder →
  * Batch → PartitionReaderFactory → PartitionReader, with the read
  * happening on the executor via the Hadoop FS API so the same code works
  * against HDFS/S3. The manifest splits into byte-range partitions
  * (`splitSizeBytes`, default 4 MiB) using the standard text-split
  * convention — a non-zero-offset partition discards its first (possibly
  * partial) line and reads one line past its end — so a million-entry
  * manifest fans out across the cluster instead of bottlenecking one task.
  */
class ManifestDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ManifestTable(properties.get("path"),
      Option(properties.get("splitSizeBytes")).map(_.toLong)
        .getOrElse(ManifestDataSource.DefaultSplitBytes))
}

object ManifestDataSource {
  val schema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false)))
  val DefaultSplitBytes: Long = 4L << 20
}

private[sources] class ManifestTable(path: String, splitBytes: Long)
    extends Table with SupportsRead {
  require(path != null, "ManifestDataSource requires option(\"path\", ...)")
  override def name(): String = s"manifest($path)"
  override def schema(): StructType = ManifestDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(path, splitBytes)
}

private[sources] class ManifestScanBuilder(path: String, splitBytes: Long)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = ManifestDataSource.schema
  override def toBatch: Batch = this
  // One partition per `splitBytes` byte range — only a cheap FileStatus on
  // the driver, never the manifest content; line-boundary handling is the
  // reader's job (text-split convention).
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val len = p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())
      .getFileStatus(p).getLen
    val split = math.max(1L, splitBytes)
    val n = math.max(1L, (len + split - 1) / split).toInt
    (0 until n).map { i =>
      ManifestPartition(path, i * split, math.min((i + 1) * split, len))
    }.toArray
  }
  // Capture the session's Hadoop configuration on the driver so executor-side
  // reads see the same filesystem settings/credentials (S3 keys, HDFS nameservice)
  // as the session — a fresh `new Configuration()` on the executor would not.
  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] case class ManifestPartition(path: String, start: Long, end: Long)
    extends InputPartition

private[sources] class ManifestReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestReader(partition.asInstanceOf[ManifestPartition], conf)
}

/** Reads the lines of one byte range, Hadoop LineRecordReader-style: a
  * partition starting past 0 discards the line containing its first byte
  * (the previous partition reads through it), and every partition keeps
  * reading while the next line STARTS at or before its end — so each line
  * lands in exactly one partition regardless of where splits fall.
  */
private[sources] class ManifestReader(part: ManifestPartition, conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(part.path)
    p.getFileSystem(conf.value).open(p)
  }
  private var pos = part.start
  private val lineReader = {
    in.seek(part.start)
    new org.apache.hadoop.util.LineReader(in)
  }
  private val text = new org.apache.hadoop.io.Text()
  if (part.start > 0) pos += lineReader.readLine(text)
  private var current: String = _

  override def next(): Boolean = {
    while (pos <= part.end) {
      val n = lineReader.readLine(text)
      if (n == 0) return false
      pos += n
      val l = text.toString.trim
      if (l.nonEmpty && !l.startsWith("#")) { current = l; return true }
    }
    false
  }
  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(current),
      UTF8String.fromString(Ingest.tableNameFor(current)))
  override def close(): Unit = lineReader.close()
}
