package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteOrder
import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.PcapFixtures.BaseTs

/** pcapng container support — the format the reference refuses with
  * `unreachable!()` (main.rs:108). Pins: golden parity with the legacy
  * decode of the same 12 frames, per-section byte order, if_tsresol,
  * SPB, unknown-block skipping, strict-mode errors naming the capture,
  * and end-to-end reads through the DSv2 connector. */
class PcapngSpec extends SparkTestBase {
  private val LE = ByteOrder.LITTLE_ENDIAN
  private val BE = ByteOrder.BIG_ENDIAN

  private lazy val legacyRows = PcapParser.parseFile(PcapFixtures.goldenPcap).toVector

  test("golden: pcapng of the 12 fixture frames decodes identically to legacy pcap") {
    val ng = PcapParser.parseFile(PcapFixtures.goldenPcapng).toVector
    assert(ng == legacyRows)
  }

  test("big-endian section with nanosecond if_tsresol decodes identically") {
    val ng = PcapParser.parseFile(
      PcapFixtures.pcapngFile(PcapFixtures.goldenFrames, nsResol = true,
        bigEndian = true)).toVector
    assert(ng == legacyRows) // trailer rows prove ts units converted right
  }

  test("SPB decodes the network stack; no timestamp means no trailer window") {
    val frame = PcapFixtures.goldenFrames(7)._1 // has a valid Metamako trailer
    val out = new ByteArrayOutputStream()
    out.write(PcapFixtures.pcapngShb(LE))
    out.write(PcapFixtures.pcapngIdb(LE))
    out.write(PcapFixtures.pcapngSpb(frame, LE))
    val rows = PcapParser.parseFile(out.toByteArray).toVector
    assert(rows.size == 1)
    assert(rows.head.protocol.contains("UDP")) // network decode intact
    assert(rows.head.mm_ts.isEmpty)            // ±300 s window anchored at 0
  }

  test("SPB honors the IDB snaplen: block pad bytes don't extend the frame") {
    val frame = PcapFixtures.goldenFrames.head._1 // 42B eth+ipv4+udp
    val out = new ByteArrayOutputStream()
    out.write(PcapFixtures.pcapngShb(LE))
    val idb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    idb.putShort(1).putShort(0).putInt(37) // snaplen 37: cuts the UDP ports
    out.write(PcapFixtures.pcapngBlock(1, idb.array(), LE))
    // SPB: orig_len 42, 37 captured bytes, 3 block-alignment pad bytes
    val spb = java.nio.ByteBuffer.allocate(4 + 37).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    spb.putInt(frame.length).put(frame.take(37))
    out.write(PcapFixtures.pcapngBlock(3, spb.array(), LE))
    val rows = PcapParser.parseFile(out.toByteArray).toVector
    assert(rows.size == 1)
    val p = rows.head
    assert(p.len.contains(42L) && p.protocol.contains("UDP"))
    // captured = min(orig_len, snaplen) per the spec: the pad bytes must
    // NOT count as frame data, so the 4-byte port read at offset 34 is
    // out of bounds of the 37 captured bytes → NULL (with the pad leaked
    // in, take would be 40 and the ports would wrongly decode)
    assert(p.src_port.isEmpty && p.dst_port.isEmpty)
  }

  test("unknown block types between IDB and EPBs are skipped") {
    val out = new ByteArrayOutputStream()
    out.write(PcapFixtures.pcapngShb(LE))
    out.write(PcapFixtures.pcapngIdb(LE))
    out.write(PcapFixtures.pcapngBlock(0x00000004, Array.fill[Byte](20)(0x55), LE)) // NRB
    PcapFixtures.goldenFrames.foreach { case (d, ts) =>
      out.write(PcapFixtures.pcapngEpb(d, ts * 1000000L, LE))
    }
    assert(PcapParser.parseFile(out.toByteArray).toVector == legacyRows)
  }

  test("two sections with different byte orders in one file") {
    val f = PcapFixtures.goldenFrames.head
    val out = new ByteArrayOutputStream()
    out.write(PcapFixtures.pcapngShb(LE))
    out.write(PcapFixtures.pcapngIdb(LE))
    out.write(PcapFixtures.pcapngEpb(f._1, f._2 * 1000000L, LE))
    out.write(PcapFixtures.pcapngShb(BE))
    out.write(PcapFixtures.pcapngIdb(BE))
    out.write(PcapFixtures.pcapngEpb(f._1, f._2 * 1000000L, BE))
    val rows = PcapParser.parseFile(out.toByteArray).toVector
    assert(rows.size == 2)
    assert(rows.map(_.copy(pkt_idx = 0)).distinct.size == 1) // same decode twice
    assert(rows.map(_.pkt_idx) == Vector(0L, 1L))
  }

  test("chunked pcapng: union over byte-boundary chunks equals unsplit; section state replays") {
    // two sections with DIFFERENT byte orders: a chunk starting in the BE
    // section must have replayed the second SHB/IDB through the skim
    val f = PcapFixtures.goldenFrames.head
    val out = new ByteArrayOutputStream()
    out.write(PcapFixtures.pcapngShb(LE))
    out.write(PcapFixtures.pcapngIdb(LE))
    PcapFixtures.goldenFrames.foreach { case (d, ts) =>
      out.write(PcapFixtures.pcapngEpb(d, ts * 1000000L, LE)) }
    out.write(PcapFixtures.pcapngShb(BE))
    out.write(PcapFixtures.pcapngIdb(BE, nsResol = true))
    out.write(PcapFixtures.pcapngEpb(f._1, f._2 * 1000000000L, BE))
    val bytes = out.toByteArray
    val full = PcapParser.parseFile(bytes).toVector
    assert(full.size == PcapFixtures.goldenFrames.size + 1)
    for (chunkSize <- Seq(1, 52, 100, 256, 100000)) {
      val n = ((bytes.length + chunkSize - 1) / chunkSize).max(1)
      val union = (0 until n).flatMap { i =>
        val start = i.toLong * chunkSize
        val end = if (i == n - 1) Long.MaxValue else (i + 1).toLong * chunkSize
        PcapParser.parsePcapng(bytes, PcapParser.WantsAll, strict = true,
          "chunked.pcapng", start, end)
      }.toVector
      assert(union == full, s"chunkSize=$chunkSize broke pcapng chunk parity")
    }
  }

  test("strict: EPB referencing an undeclared interface names the capture") {
    val out = new ByteArrayOutputStream()
    out.write(PcapFixtures.pcapngShb(LE))
    out.write(PcapFixtures.pcapngIdb(LE))
    out.write(PcapFixtures.pcapngEpb(PcapFixtures.goldenFrames.head._1,
      BaseTs * 1000000L, LE, iface = 3))
    val e = intercept[PcapParser.PcapFormatException] {
      PcapParser.parseFile(out.toByteArray, strict = true, name = "iface.pcapng").toVector
    }
    assert(e.getMessage.contains("iface.pcapng"))
    assert(e.getMessage.contains("undeclared interface 3"))
    // permissive: falls back to microseconds and keeps the record
    assert(PcapParser.parseFile(out.toByteArray).size == 1)
  }

  test("strict: SPB before any IDB in its section is an error (spec: IDB first)") {
    val out = new ByteArrayOutputStream()
    out.write(PcapFixtures.pcapngShb(LE))
    out.write(PcapFixtures.pcapngSpb(PcapFixtures.goldenFrames(7)._1, LE))
    val e = intercept[PcapParser.PcapFormatException] {
      PcapParser.parseFile(out.toByteArray, strict = true,
        name = "spb-first.pcapng").toVector
    }
    assert(e.getMessage.contains("spb-first.pcapng"))
    assert(e.getMessage.contains("before any interface"))
    // permissive keeps the record with the no-snaplen fallback
    assert(PcapParser.parseFile(out.toByteArray).size == 1)
  }

  test("strict: block overrunning the file names the capture; permissive salvages prefix") {
    val good = PcapFixtures.goldenPcapng
    val cut = good.take(good.length - 7) // slice into the last EPB
    val e = intercept[PcapParser.PcapFormatException] {
      PcapParser.parseFile(cut, strict = true, name = "cut.pcapng").toVector
    }
    assert(e.getMessage.contains("cut.pcapng"))
    val salvaged = PcapParser.parseFile(cut).toVector
    assert(salvaged == legacyRows.dropRight(1)) // every intact record kept
  }

  test("strict: packet block before any section header is an error") {
    // parseFile would reject this at the magic sniff (first bytes are an EPB
    // type, not the SHB palindrome) — exercise the block walker directly
    val epb = PcapFixtures.pcapngEpb(PcapFixtures.goldenFrames.head._1,
      BaseTs * 1000000L, LE)
    val e = intercept[PcapParser.PcapFormatException] {
      PcapParser.parsePcapng(epb ++ PcapFixtures.goldenPcapng, strict = true,
        name = "headless.pcapng").toVector
    }
    assert(e.getMessage.contains("not a section header"))
    assert(PcapParser.parsePcapng(epb).isEmpty) // permissive: no section, no rows
  }

  test("readStream.format(\"pcap\") picks up a .pcapng file rolling into the directory") {
    val d = Files.createTempDirectory("pcapng-stream").toFile
    Files.write(new java.io.File(d, "c00.pcap").toPath, PcapFixtures.goldenPcap)
    val q = spark.readStream.format("pcap").load(d.getAbsolutePath)
      .writeStream.format("memory").queryName("pcapng_stream_out")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("pcapng_stream_out").count() == 12)
    // a modern capture host rolls a pcapng file into the same directory
    Files.write(new java.io.File(d, "c01.pcapng").toPath, PcapFixtures.goldenPcapng)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("pcapng_stream_out")
    assert(rows.count() == 24)
    import org.apache.spark.sql.functions.col
    assert(rows.filter(col("file").endsWith("c01.pcapng")).count() == 12)
  }

  test("DSv2: .pcapng files read through format(\"pcap\"), mixed with legacy") {
    val d = Files.createTempDirectory("pcapng-dsv2").toFile
    Files.write(new java.io.File(d, "a.pcap").toPath, PcapFixtures.goldenPcap)
    Files.write(new java.io.File(d, "b.pcapng").toPath, PcapFixtures.goldenPcapng)
    val df = spark.read.format("pcap").load(d.getAbsolutePath)
    assert(df.count() == 24)
    // identical per-file decode: same 12-row golden content from each
    val perFile = df.groupBy("file").count().collect().map(_.getLong(1)).toSeq
    assert(perFile == Seq(12L, 12L))
    val distinctByContent = df.drop("file").distinct().count()
    assert(distinctByContent == 12)
  }
}
