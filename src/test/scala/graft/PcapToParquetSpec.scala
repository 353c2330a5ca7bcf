package graft

import java.nio.file.Files

import graft.sources.PcapFixtures

/** End-to-end CLI contract test: golden capture -> PcapToParquet main ->
  * parquet with the reference's 9 columns in reference order. */
class PcapToParquetSpec extends SparkTestBase {

  test("main writes the reference's 9-column zstd parquet from a capture") {
    spark // ensure the shared session exists before main's getOrCreate
    val dir = Files.createTempDirectory("p2p").toFile
    val in = new java.io.File(dir, "golden.pcap")
    Files.write(in.toPath, PcapFixtures.goldenPcap)
    val out = new java.io.File(dir, "out.parquet").getAbsolutePath

    PcapToParquet.main(Array(in.getAbsolutePath, out))

    val back = spark.read.parquet(out)
    assert(back.schema.fieldNames.toSeq == Seq("src_ip", "dst_ip", "len",
      "protocol", "src_port", "dst_port", "mm_ts", "mm_id", "mm_port"))
    assert(back.count() == 12)
    val udp = back.filter(org.apache.spark.sql.functions.col("protocol") === "UDP").count()
    assert(udp >= 4) // golden frames 1,7,8,9,10,11 are UDP
  }
}
