package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic synthetic legacy-pcap byte fixtures (FIXTURES.md §2).
  * No pcap files exist in the corpus, so both the `pcap_ingest` query and
  * the golden-row scalatests synthesize captures from these builders.
  * Layouts follow /root/reference/src/main.rs:234-252 (Ethernet),
  * 185-211 (IPv4), 213-231 (TCP/UDP), 157-183 (Metamako trailer). */
object PcapFixtures {
  val BaseTs = 1700000000L // fixed capture clock for heuristic validity

  def ethernet(etherType: Int, payload: Array[Byte],
               vlan: Boolean = false): Array[Byte] = {
    val bb = ByteBuffer.allocate(14 + (if (vlan) 4 else 0) + payload.length)
      .order(ByteOrder.BIG_ENDIAN)
    bb.put(Array.fill[Byte](6)(0x02)).put(Array.fill[Byte](6)(0x04)) // MACs (ignored)
    if (vlan) bb.putShort(0x8100.toShort).putShort(0x0064.toShort)   // 802.1Q tag
    bb.putShort(etherType.toShort).put(payload)
    bb.array()
  }

  /** Ethernet frame under an arbitrary VLAN tag STACK (r7): `tpids`
    * outermost-first (0x8100 / 0x88A8 QinQ / 0x9100), each with a dummy
    * TCI, then the real EtherType and payload. */
  def ethernetStacked(tpids: Seq[Int], etherType: Int,
                      payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(14 + 4 * tpids.length + payload.length)
      .order(ByteOrder.BIG_ENDIAN)
    bb.put(Array.fill[Byte](6)(0x02)).put(Array.fill[Byte](6)(0x04))
    tpids.foreach(t => bb.putShort(t.toShort).putShort(0x0064.toShort))
    bb.putShort(etherType.toShort).put(payload)
    bb.array()
  }

  /** IPv6 fixed header (r7): 40 bytes — version/class/flow, payload len,
    * next-header, hop limit, 16-byte src/dst — followed by `payload`
    * (which may itself start with extension headers). */
  def ipv6(nextHeader: Int, src: Array[Byte], dst: Array[Byte],
           payload: Array[Byte]): Array[Byte] = {
    require(src.length == 16 && dst.length == 16, "ipv6 addrs are 16 bytes")
    val bb = ByteBuffer.allocate(40 + payload.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0x60000000)                    // version 6, tc/flow 0
    bb.putShort(payload.length.toShort)      // payload length
    bb.put(nextHeader.toByte).put(64.toByte) // next header, hop limit
    bb.put(src).put(dst).put(payload)
    bb.array()
  }

  /** One IPv6 extension header of the (next, (len+1)·8) family — 8 bytes
    * at len=0: next-header, hdr-ext-len, 6 padding bytes. */
  def ipv6Ext(nextHeader: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8)
    bb.put(nextHeader.toByte).put(0.toByte).put(Array.fill[Byte](6)(0))
    bb.array()
  }

  def ipv4(proto: Int, srcIp: Array[Byte], dstIp: Array[Byte],
           l4: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(20 + l4.length).order(ByteOrder.BIG_ENDIAN)
    bb.put(0x45.toByte).put(0.toByte).putShort((20 + l4.length).toShort) // ver/IHL, tos, total
    bb.putShort(1.toShort).putShort(0.toShort)                          // id, flags/frag
    bb.put(64.toByte).put(proto.toByte).putShort(0.toShort)             // ttl, proto, csum
    bb.put(srcIp).put(dstIp).put(l4)
    bb.array()
  }

  def l4Ports(src: Int, dst: Int, extra: Int = 4): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + extra).order(ByteOrder.BIG_ENDIAN)
    bb.putShort(src.toShort).putShort(dst.toShort).put(Array.fill[Byte](extra)(0x00))
    bb.array()
  }

  /** 16-byte Metamako trailer: 12 bytes = flags/padding + BE i32 seconds +
    * BE i32 ns live at [end-12, end-4); device id BE u16 at end-3, port u8
    * at end-1 (main.rs:157-183). */
  def mmTrailer(sec: Long, ns: Int, devId: Int, devPort: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(0)                       // bytes 0-3: padding/flags
    bb.putInt(sec.toInt).putInt(ns)    // bytes 4-11: seconds, nanoseconds
    bb.put(0.toByte)                   // byte 12 (end-4): flags
    bb.putShort(devId.toShort)         // bytes 13-14 (end-3..end-2)
    bb.put(devPort.toByte)             // byte 15 (end-1)
    bb.array()
  }

  private val ipA = Array[Byte](10, 0, 0, 1)
  private val ipB = Array[Byte](10, 0, 0, 2)

  /** The 12 golden frames of FIXTURES.md §2 (frame bytes, ts_sec). */
  def goldenFrames: Seq[(Array[Byte], Long)] = Seq(
    // 1. IPv4/UDP, no trailer
    (ethernet(0x0800, ipv4(17, ipA, ipB, l4Ports(5353, 53))), BaseTs),
    // 2. IPv4/TCP
    (ethernet(0x0800, ipv4(6, ipA, ipB, l4Ports(443, 59000))), BaseTs),
    // 3. IPv4/ICMP -> ports NULL
    (ethernet(0x0800, ipv4(1, ipA, ipB, Array.fill[Byte](8)(0))), BaseTs),
    // 4. IPv4/IGMP -> ports NULL
    (ethernet(0x0800, ipv4(2, ipA, ipB, Array.fill[Byte](8)(0))), BaseTs),
    // 5. IPv4 proto 47 (GRE) -> IPs set, protocol NULL
    (ethernet(0x0800, ipv4(47, ipA, ipB, Array.fill[Byte](8)(0))), BaseTs),
    // 6. ARP -> only len set
    (ethernet(0x0806, Array.fill[Byte](28)(0)), BaseTs),
    // 7. VLAN-tagged IPv4/UDP
    (ethernet(0x0800, ipv4(17, ipA, ipB, l4Ports(68, 67)), vlan = true), BaseTs),
    // 8. valid Metamako trailer
    (ethernet(0x0800, ipv4(17, ipA, ipB,
      l4Ports(1000, 2000) ++ mmTrailer(BaseTs + 1, 500, 7, 3))), BaseTs),
    // 9. two stacked trailers -> first-appended (innermost) wins: dev 1
    (ethernet(0x0800, ipv4(17, ipA, ipB,
      l4Ports(1000, 2000) ++ mmTrailer(BaseTs + 1, 111, 1, 1)
                          ++ mmTrailer(BaseTs + 2, 222, 2, 2))), BaseTs),
    // 10. trailer + trailing 4-byte FCS -> found via the len-4 retry
    (ethernet(0x0800, ipv4(17, ipA, ipB,
      l4Ports(1000, 2000) ++ mmTrailer(BaseTs + 3, 333, 9, 4)
                          ++ Array[Byte](0x7f, 0x7f, 0x7f, 0x7f))), BaseTs),
    // 11. trailer-lookalike with ts far outside the ±300 s window -> NULL
    (ethernet(0x0800, ipv4(17, ipA, ipB,
      l4Ports(1000, 2000) ++ mmTrailer(BaseTs + 100000, 500, 7, 3))), BaseTs),
    // 12. truncated IPv4 header (reference panics; we yield IP/proto NULLs)
    (ethernet(0x0800, Array[Byte](0x45, 0x00, 0x00)), BaseTs))

  /** Serialize frames into one legacy little-endian pcap buffer
    * (global header magic 0xa1b2c3d4, version 2.4, linktype 1 —
    * FIXTURES.md §2). */
  def pcapFile(frames: Seq[(Array[Byte], Long)], snapLen: Int = 65535): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gh = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    gh.putInt(0xa1b2c3d4).putShort(2).putShort(4).putInt(0).putInt(0)
    gh.putInt(snapLen).putInt(1)
    out.write(gh.array())
    frames.foreach { case (data, ts) =>
      val rh = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      rh.putInt(ts.toInt).putInt(0).putInt(data.length).putInt(data.length)
      out.write(rh.array())
      out.write(data)
    }
    out.toByteArray
  }

  def goldenPcap: Array[Byte] = pcapFile(goldenFrames)

  private def v6(last: Int, first: Int = 0x20): Array[Byte] =
    Array.tabulate[Byte](16) {
      case 0 => first.toByte
      case 1 => 0x01
      case 15 => last.toByte
      case _ => 0
    }

  /** Mixed IPv4/IPv6 frames (r7): plain + VLAN-stacked IPv6 TCP/UDP,
    * ICMPv6, and an IPv4 control row — the capture `pcap_ipv6_flows`
    * aggregates (frames the reference decodes to all-NULL). */
  def mixedV6Frames: Seq[(Array[Byte], Long)] = Seq(
    (ethernet(0x86dd, ipv6(6, v6(1), v6(2), l4Ports(443, 51000))), BaseTs),
    (ethernet(0x86dd, ipv6(6, v6(1), v6(2), l4Ports(443, 51001))), BaseTs + 1),
    (ethernet(0x86dd, ipv6(17, v6(3), v6(2), l4Ports(5353, 5353))), BaseTs + 2),
    // QinQ-wrapped IPv6 UDP: both extensions compose
    (ethernetStacked(Seq(0x88a8, 0x8100), 0x86dd,
      ipv6(17, v6(3), v6(2), l4Ports(5353, 5353))), BaseTs + 3),
    // extension-header chain to TCP
    (ethernet(0x86dd, ipv6(0, v6(4), v6(5),
      ipv6Ext(60) ++ ipv6Ext(6) ++ l4Ports(8080, 52000))), BaseTs + 4),
    (ethernet(0x86dd, ipv6(58, v6(6), v6(7), Array.fill[Byte](8)(0))), BaseTs + 5),
    (ethernet(0x0800, ipv4(6, Array[Byte](10, 0, 0, 1),
      Array[Byte](10, 0, 0, 2), l4Ports(80, 53000))), BaseTs + 6))

  def mixedV6Pcap: Array[Byte] = pcapFile(mixedV6Frames)

  // ---- pcapng builders -----------------------------------------------------

  /** One pcapng block: type, total length, body (padded to 4), trailing
    * total length. SHB's type value is an endian palindrome, so the same
    * builder serves both byte orders. */
  def pcapngBlock(btype: Int, body: Array[Byte], order: ByteOrder): Array[Byte] = {
    val pad = (4 - body.length % 4) % 4
    val total = 12 + body.length + pad
    val bb = ByteBuffer.allocate(total).order(order)
    bb.putInt(btype).putInt(total).put(body)
    bb.position(bb.position() + pad)
    bb.putInt(total)
    bb.array()
  }

  /** SHB with the given byte order's BOM, version 1.0, unknown section len. */
  def pcapngShb(order: ByteOrder): Array[Byte] = {
    val bb = ByteBuffer.allocate(16).order(order)
    bb.putInt(0x1a2b3c4d).putShort(1).putShort(0).putLong(-1L)
    pcapngBlock(0x0a0d0d0a, bb.array(), order)
  }

  /** IDB: linktype 1 (Ethernet), snaplen 65535; optionally an if_tsresol
    * option (code 9) selecting nanosecond timestamps. */
  def pcapngIdb(order: ByteOrder, nsResol: Boolean = false): Array[Byte] = {
    val body =
      if (!nsResol) {
        val bb = ByteBuffer.allocate(8).order(order)
        bb.putShort(1).putShort(0).putInt(65535)
        bb.array()
      } else {
        val bb = ByteBuffer.allocate(8 + 8 + 4).order(order)
        bb.putShort(1).putShort(0).putInt(65535)
        bb.putShort(9).putShort(1)                      // if_tsresol, len 1
        bb.put(9.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // 10^-9 + pad
        bb.putShort(0).putShort(0)                      // opt_endofopt
        bb.array()
      }
    pcapngBlock(1, body, order)
  }

  /** EPB for `data` with timestamp `ts` (already in the IDB's units). */
  def pcapngEpb(data: Array[Byte], ts: Long, order: ByteOrder,
                iface: Int = 0): Array[Byte] = {
    val bb = ByteBuffer.allocate(20 + data.length).order(order)
    bb.putInt(iface).putInt((ts >>> 32).toInt).putInt(ts.toInt)
    bb.putInt(data.length).putInt(data.length)
    bb.put(data)
    pcapngBlock(6, bb.array(), order)
  }

  /** SPB for `data` (no timestamp, interface 0 implied). */
  def pcapngSpb(data: Array[Byte], order: ByteOrder): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + data.length).order(order)
    bb.putInt(data.length).put(data)
    pcapngBlock(3, bb.array(), order)
  }

  /** Serialize frames into one pcapng buffer: SHB + IDB + one EPB per
    * frame. `nsResol` selects nanosecond if_tsresol; `bigEndian` writes
    * the whole section big-endian (the SHB's BOM announces it). */
  def pcapngFile(frames: Seq[(Array[Byte], Long)], nsResol: Boolean = false,
                 bigEndian: Boolean = false): Array[Byte] = {
    val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val unitsPerSec = if (nsResol) 1000000000L else 1000000L
    val out = new ByteArrayOutputStream()
    out.write(pcapngShb(order))
    out.write(pcapngIdb(order, nsResol))
    frames.foreach { case (data, ts) =>
      out.write(pcapngEpb(data, ts * unitsPerSec, order))
    }
    out.toByteArray
  }

  def goldenPcapng: Array[Byte] = pcapngFile(goldenFrames)
}
