package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.PcapFixtures.BaseTs

/** DataSource V2 connector tests: schema, per-file partitioning, and
  * row-level agreement with the direct parser. */
class PcapSourceSpec extends SparkTestBase {

  private lazy val dir = {
    val d = Files.createTempDirectory("pcap-src").toFile
    Files.write(new java.io.File(d, "a.pcap").toPath, PcapFixtures.goldenPcap)
    val second = PcapFixtures.pcapFile(Seq(
      (PcapFixtures.ethernet(0x0800, PcapFixtures.ipv4(6,
        Array[Byte](10, 9, 9, 9), Array[Byte](10, 8, 8, 8),
        PcapFixtures.l4Ports(80, 8080))), BaseTs)))
    Files.write(new java.io.File(d, "b.pcap").toPath, second)
    d.getAbsolutePath
  }

  test("format(\"pcap\") reads a directory with one partition per file") {
    val df = spark.read.format("pcap").load(dir)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 13) // 12 golden + 1
  }

  test("connector rows agree with the direct parser") {
    val viaSource = spark.read.format("pcap").load(dir)
      .filter(org.apache.spark.sql.functions.col("file").endsWith("a.pcap"))
      .drop("file")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(2)), Option(r.get(4))))
      .sortBy(_._1)
    val direct = PcapParser.parseFile(PcapFixtures.goldenPcap).toVector
      .map(p => (p.pkt_idx, p.dst_ip, p.protocol))
    assert(viaSource.toVector == direct)
  }

  test("schema exposes the 9 reference columns plus file and pkt_idx") {
    val fields = spark.read.format("pcap").load(dir).schema.fieldNames.toSeq
    assert(fields == Seq("file", "pkt_idx", "src_ip", "dst_ip", "len",
      "protocol", "src_port", "dst_port", "mm_ts", "mm_id", "mm_port"))
  }
}
