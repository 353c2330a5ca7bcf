package graft.sources

import graft.SparkTestBase
import graft.sources.PcapParser.Packet
import graft.sources.PcapFixtures.BaseTs

/** Golden-row tests for the 12 fixture frames of FIXTURES.md §2 — pins the
  * reference semantics (/root/reference/src/main.rs:128-252) including the
  * behavioral quirks: first-appended trailer wins, FCS retry, ±300 s
  * heuristic window, and our bounds-safe divergence on truncation. */
class PcapParserSpec extends SparkTestBase {
  lazy val rows: Vector[Packet] = PcapParser.parseFile(PcapFixtures.goldenPcap).toVector

  test("parses all 12 records of the golden capture") {
    assert(rows.size == 12)
    assert(rows.map(_.pkt_idx) == (0L until 12L).toVector)
  }

  test("1: IPv4/UDP — ips, ports, protocol set; mm_* NULL") {
    val p = rows(0)
    assert(p.src_ip.contains("10.0.0.1") && p.dst_ip.contains("10.0.0.2"))
    assert(p.protocol.contains("UDP"))
    assert(p.src_port.contains(5353) && p.dst_port.contains(53))
    assert(p.len.contains(42L))
    assert(p.mm_ts.isEmpty && p.mm_id.isEmpty && p.mm_port.isEmpty)
  }

  test("2: IPv4/TCP — protocol TCP with ports") {
    val p = rows(1)
    assert(p.protocol.contains("TCP"))
    assert(p.src_port.contains(443) && p.dst_port.contains(59000))
  }

  test("3+4: ICMP/IGMP — protocol named, ports NULL (README.md:29-30)") {
    assert(rows(2).protocol.contains("ICMP") && rows(2).src_port.isEmpty)
    assert(rows(3).protocol.contains("IGMP") && rows(3).dst_port.isEmpty)
  }

  test("5: unmapped IP protocol (GRE 47) — ips set, protocol NULL") {
    val p = rows(4)
    assert(p.src_ip.contains("10.0.0.1") && p.protocol.isEmpty)
  }

  test("6: ARP — only len set (main.rs:247-250 silent ignore)") {
    val p = rows(5)
    assert(p.len.contains(42L))
    assert(p.src_ip.isEmpty && p.dst_ip.isEmpty && p.protocol.isEmpty)
  }

  test("7: single 802.1Q VLAN tag — inner IPv4/UDP decoded at offset 18") {
    val p = rows(6)
    assert(p.protocol.contains("UDP"))
    assert(p.src_port.contains(68) && p.dst_port.contains(67))
  }

  test("8: valid Metamako trailer — mm_ts = s*1e9+ns, id, port") {
    val p = rows(7)
    assert(p.mm_ts.contains((BaseTs + 1) * 1000000000L + 500))
    assert(p.mm_id.contains(7) && p.mm_port.contains(3))
    assert(p.protocol.contains("UDP")) // network decode unaffected
  }

  test("9: stacked trailers — first-appended (innermost) wins (main.rs:127)") {
    val p = rows(8)
    assert(p.mm_ts.contains((BaseTs + 1) * 1000000000L + 111))
    assert(p.mm_id.contains(1) && p.mm_port.contains(1))
  }

  test("10: trailer behind 4-byte FCS — found by the len-4 retry (main.rs:141)") {
    val p = rows(9)
    assert(p.mm_ts.contains((BaseTs + 3) * 1000000000L + 333))
    assert(p.mm_id.contains(9) && p.mm_port.contains(4))
  }

  test("11: trailer-lookalike outside ±300 s window — rejected (main.rs:174)") {
    val p = rows(10)
    assert(p.mm_ts.isEmpty && p.mm_id.isEmpty && p.mm_port.isEmpty)
  }

  test("12: truncated IPv4 header — NULLs, not a crash (divergence from main.rs:190-191)") {
    val p = rows(11)
    assert(p.len.contains(17L))
    assert(p.src_ip.isEmpty && p.protocol.isEmpty)
  }

  test("ns >= 1e9 in the ns field rejects the trailer (main.rs:174)") {
    val frame = PcapFixtures.ethernet(0x0800, PcapFixtures.ipv4(17,
      Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
      PcapFixtures.l4Ports(1, 2) ++ PcapFixtures.mmTrailer(BaseTs, 1000000000, 5, 5)))
    val p = PcapParser.decodeRecord(0, frame, BaseTs, frame.length.toLong)
    assert(p.mm_ts.isEmpty)
  }

  test("pcapng magic yields an empty iterator instead of the reference's panic (main.rs:108)") {
    val ng = Array[Byte](0x0a, 0x0d, 0x0d, 0x0a) ++ Array.fill[Byte](40)(0)
    assert(PcapParser.parseFile(ng).isEmpty)
  }
}
