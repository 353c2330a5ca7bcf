package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.sources.PcapFixtures.BaseTs

/** Property tests (SURVEY.md §5.2): parser invariants over random inputs. */
object PcapPropertySpec extends Properties("PcapParser") {

  property("never throws on arbitrary bytes (bounds safety)") =
    forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val p = PcapParser.decodeRecord(0, bytes, BaseTs, bytes.length.toLong)
      p.len.contains(bytes.length.toLong)
    }

  private val genPacket: Gen[(Array[Byte], Int)] = for {
    proto <- Gen.oneOf(1, 2, 6, 17, 47, 89)
    sp <- Gen.chooseNum(0, 65535)
    dp <- Gen.chooseNum(0, 65535)
    vlan <- Gen.oneOf(true, false)
  } yield {
    val ips = (Array[Byte](10, 1, 2, 3), Array[Byte](10, 4, 5, 6))
    val frame = PcapFixtures.ethernet(0x0800,
      PcapFixtures.ipv4(proto, ips._1, ips._2, PcapFixtures.l4Ports(sp, dp)), vlan)
    (frame, proto)
  }

  property("ports set iff protocol is TCP or UDP (main.rs:198-231)") =
    forAll(genPacket) { case (frame, proto) =>
      val p = PcapParser.decodeRecord(0, frame, BaseTs, frame.length.toLong)
      val l4 = proto == 6 || proto == 17
      p.src_port.isDefined == l4 && p.dst_port.isDefined == l4
    }

  property("valid trailer ns component always < 1e9 when extracted") =
    forAll(Gen.chooseNum(0, 999999999), Gen.chooseNum(-299L, 299L)) { (ns, skew) =>
      val frame = PcapFixtures.ethernet(0x0800, PcapFixtures.ipv4(17,
        Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
        PcapFixtures.l4Ports(1, 2) ++ PcapFixtures.mmTrailer(BaseTs + skew, ns, 1, 1)))
      val p = PcapParser.decodeRecord(0, frame, BaseTs, frame.length.toLong)
      p.mm_ts.exists(ts => math.floorMod(ts, 1000000000L) < 1000000000L) &&
        p.mm_ts.contains((BaseTs + skew) * 1000000000L + ns)
    }

  // Adversarial container input: a VALID global header followed by random
  // record bytes, so record parsing is actually reached (random bytes alone
  // almost never contain the magic — the pre-round-3 version of this suite
  // missed a confirmed u32-incl_len-wrap crash for exactly that reason).
  private val leGlobalHeader: Array[Byte] = PcapFixtures.pcapFile(Seq.empty)

  property("parseFile never throws and always terminates on adversarial record bytes") =
    forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { junk =>
      val rows = PcapParser.parseFile(leGlobalHeader ++ junk).toVector
      // each record consumes >= 16 bytes, so the row count is bounded
      rows.size <= junk.length / 16 + 1
    }

  property("pcap container round-trip preserves record count and order") =
    forAll(Gen.chooseNum(0, 20)) { n =>
      val frames = (0 until n).map { i =>
        (PcapFixtures.ethernet(0x0800, PcapFixtures.ipv4(17,
          Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
          PcapFixtures.l4Ports(i, i + 1))), BaseTs + i)
      }
      val parsed = PcapParser.parseFile(PcapFixtures.pcapFile(frames)).toVector
      parsed.size == n && parsed.map(_.pkt_idx) == (0L until n.toLong).toVector &&
        parsed.zipWithIndex.forall { case (p, i) => p.src_port.contains(i) }
    }
}
