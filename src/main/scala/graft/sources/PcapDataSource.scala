package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for legacy pcap captures:
  * `spark.read.format("pcap").load(pathOrDir)` (SURVEY.md §4.3 / §7 M5 —
  * the "custom DataSource V2" milestone; v1 was binaryFile + flatMap).
  *
  * Split model: ONE InputPartition PER CAPTURE FILE. Legacy pcap has no
  * record sync markers, so a file cannot be split mid-stream safely
  * (SURVEY.md §7 risk #4) — at 100 TB parallelism comes from the number
  * of capture files, which is how capture hardware rolls them anyway.
  * Decoding happens inside each PartitionReader on executors; file bytes
  * never touch the driver.
  */
class PcapDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pcap"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PcapDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PcapTable(properties.asScala.toMap)
}

object PcapDataSource {
  /** The reference's 9-column Packet row (main.rs:5-16) + file + pkt_idx,
    * unsigned types widened per SURVEY.md §1.4. */
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pkt_idx", LongType, nullable = false),
    StructField("src_ip", StringType, nullable = true),
    StructField("dst_ip", StringType, nullable = true),
    StructField("len", LongType, nullable = true),
    StructField("protocol", StringType, nullable = true),
    StructField("src_port", IntegerType, nullable = true),
    StructField("dst_port", IntegerType, nullable = true),
    StructField("mm_ts", LongType, nullable = true),
    StructField("mm_id", IntegerType, nullable = true),
    StructField("mm_port", IntegerType, nullable = true)))

  def listCaptureFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isDirectory)
      f.listFiles().filter(x => x.isFile && x.getName.endsWith(".pcap"))
        .map(_.getAbsolutePath).sorted.toSeq
    else Seq(f.getAbsolutePath)
  }
}

class PcapTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"pcap(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = PcapDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(options.get("path"))
      .orElse(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("pcap source requires a path"))
    new PcapScanBuilder(path)
  }
}

class PcapScanBuilder(path: String) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = PcapDataSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    PcapDataSource.listCaptureFiles(path).map(PcapFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = new PcapReaderFactory
}

case class PcapFilePartition(file: String) extends InputPartition

class PcapReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PcapFilePartition].file
    new PartitionReader[InternalRow] {
      private val fileUtf8 = UTF8String.fromString(file)
      private val it = PcapParser.parseFile(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)))
      private var current: PcapParser.Packet = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = {
        val p = current
        new GenericInternalRow(Array[Any](
          fileUtf8, p.pkt_idx,
          p.src_ip.map(UTF8String.fromString).orNull,
          p.dst_ip.map(UTF8String.fromString).orNull,
          p.len.map(Long.box).orNull,
          p.protocol.map(UTF8String.fromString).orNull,
          p.src_port.map(Int.box).orNull,
          p.dst_port.map(Int.box).orNull,
          p.mm_ts.map(Long.box).orNull,
          p.mm_id.map(Int.box).orNull,
          p.mm_port.map(Int.box).orNull))
      }
      override def close(): Unit = ()
    }
  }
}
