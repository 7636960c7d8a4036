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
  * Deliberately minimal (single partition — a manifest is one small file)
  * but a complete V2 implementation: TableProvider → Table → ScanBuilder →
  * Batch → PartitionReaderFactory → PartitionReader, with the read
  * happening on the executor via the Hadoop FS API so the same code works
  * against HDFS/S3.
  */
class ManifestDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ManifestTable(properties.get("path"))
}

object ManifestDataSource {
  val schema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false)))
}

private[sources] class ManifestTable(path: String) extends Table with SupportsRead {
  require(path != null, "ManifestDataSource requires option(\"path\", ...)")
  override def name(): String = s"manifest($path)"
  override def schema(): StructType = ManifestDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(path)
}

private[sources] class ManifestScanBuilder(path: String) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = ManifestDataSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(ManifestPartition(path))
  // Capture the session's Hadoop configuration on the driver so executor-side
  // reads see the same filesystem settings/credentials (S3 keys, HDFS nameservice)
  // as the session — a fresh `new Configuration()` on the executor would not.
  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf()))
}

private[sources] case class ManifestPartition(path: String) extends InputPartition

private[sources] class ManifestReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestReader(partition.asInstanceOf[ManifestPartition].path, conf)
}

private[sources] class ManifestReader(path: String, conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val lines: Iterator[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    val in = fs.open(p)
    val all = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toList
    finally in.close()
    all.iterator
  }
  private var current: String = _

  override def next(): Boolean = {
    if (!lines.hasNext) return false
    current = lines.next(); true
  }
  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(current),
      UTF8String.fromString(Ingest.tableNameFor(current)))
  override def close(): Unit = ()
}
