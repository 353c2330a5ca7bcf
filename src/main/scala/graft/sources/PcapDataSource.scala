package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for legacy pcap captures:
  * `spark.read.format("pcap").load(pathOrDir)` for batch and
  * `spark.readStream.format("pcap").load(dir)` for a growing capture
  * directory (SURVEY.md §4.3 / §7 M5 — the "custom DataSource V2"
  * milestone; v1 was binaryFile + flatMap).
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
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(options.get("path"))
      .orElse(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("pcap source requires a path"))
    new PcapScanBuilder(path)
  }
}

/** Scan with column pruning (SupportsPushDownRequiredColumns): Catalyst
  * hands us the required columns and `SELECT protocol FROM pcap` then
  * skips dotted-quad string formatting (no src_ip/dst_ip), the whole
  * network decode (no network columns), and the Metamako trailer scan
  * (no mm_* columns) per packet — at 100 TB of captures the formatting
  * alone dominates an un-pruned scan. */
class PcapScanBuilder(path: String) extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns {
  private var required: StructType = PcapDataSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    PcapDataSource.listCaptureFiles(path).map(PcapFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = new PcapReaderFactory(required)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PcapMicroBatchStream(path, required)
}

case class PcapFilePartition(file: String) extends InputPartition

/** Offset for the pcap stream: the count of (name-sorted) capture files
  * already processed. */
case class PcapOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}

/** Micro-batch stream over a GROWING capture directory — the reference's
  * refill loop (main.rs:112-115) as a deployable Structured Streaming
  * source: `spark.readStream.format("pcap").load(dir)`. Each trigger picks
  * up capture files that appeared since the last committed offset, one
  * InputPartition per new file (the same unsplittable-file granularity as
  * the batch scan). Contract: capture files are immutable once written and
  * roll with lexicographically increasing names (how capture hardware
  * names them); renames/deletes are unsupported. Column pruning applies
  * the same as the batch path. */
class PcapMicroBatchStream(path: String, readSchema: StructType) extends MicroBatchStream {
  // snapshot the listing once per latestOffset() call so a file landing
  // mid-planning can't shift indices between latestOffset and plan
  @volatile private var snapshot: Seq[String] = Nil
  override def initialOffset(): Offset = PcapOffset(0)
  override def latestOffset(): Offset = {
    snapshot = PcapDataSource.listCaptureFiles(path)
    PcapOffset(snapshot.size)
  }
  override def deserializeOffset(json: String): Offset = PcapOffset(json.trim.toInt)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PcapOffset].n
    val e = end.asInstanceOf[PcapOffset].n
    val files = if (snapshot.size >= e) snapshot else PcapDataSource.listCaptureFiles(path)
    files.slice(s, e).map(PcapFilePartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new PcapReaderFactory(readSchema)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class PcapReaderFactory(readSchema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PcapFilePartition].file
    val names = readSchema.fieldNames
    val wants = PcapParser.Wants(
      ips = names.contains("src_ip") || names.contains("dst_ip"),
      net = Seq("src_ip", "dst_ip", "protocol", "src_port", "dst_port").exists(names.contains),
      trailers = Seq("mm_ts", "mm_id", "mm_port").exists(names.contains))
    new PartitionReader[InternalRow] {
      private val fileUtf8 = UTF8String.fromString(file)
      // one value extractor per REQUIRED column, in the pruned schema's order
      private val getters: Array[PcapParser.Packet => Any] = names.map {
        case "file" => (_: PcapParser.Packet) => fileUtf8
        case "pkt_idx" => (p: PcapParser.Packet) => p.pkt_idx
        case "src_ip" => (p: PcapParser.Packet) => p.src_ip.map(UTF8String.fromString).orNull
        case "dst_ip" => (p: PcapParser.Packet) => p.dst_ip.map(UTF8String.fromString).orNull
        case "len" => (p: PcapParser.Packet) => p.len.map(Long.box).orNull
        case "protocol" => (p: PcapParser.Packet) => p.protocol.map(UTF8String.fromString).orNull
        case "src_port" => (p: PcapParser.Packet) => p.src_port.map(Int.box).orNull
        case "dst_port" => (p: PcapParser.Packet) => p.dst_port.map(Int.box).orNull
        case "mm_ts" => (p: PcapParser.Packet) => p.mm_ts.map(Long.box).orNull
        case "mm_id" => (p: PcapParser.Packet) => p.mm_id.map(Int.box).orNull
        case "mm_port" => (p: PcapParser.Packet) => p.mm_port.map(Int.box).orNull
        case other => throw new IllegalArgumentException(s"unknown pcap column $other")
      }
      private val it = PcapParser.parseFile(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)), wants)
      private var current: PcapParser.Packet = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow =
        new GenericInternalRow(getters.map(_(current)))
      override def close(): Unit = ()
    }
  }
}
