package graft.sources

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property: the pcapng block walker decodes ARBITRARY frame sets
  * identically to the legacy pcap parser, in every (byte order ×
  * timestamp resolution) combination — both containers feed the same
  * decodeRecord, so any divergence is a container-parsing bug (length
  * math, padding, endianness, tsresol conversion). */
object PcapngPropertySpec extends Properties("PcapngParser") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val BaseTs = PcapFixtures.BaseTs

  // arbitrary frame payloads: real-shaped frames (random proto/ports over
  // a valid Ethernet/IPv4 stack, some with Metamako trailers) plus pure
  // garbage bytes (decode must NULL, never throw)
  private val genRealFrame: Gen[Array[Byte]] = for {
    proto <- Gen.oneOf(1, 2, 6, 17, 47)
    sp <- Gen.chooseNum(0, 65535)
    dp <- Gen.chooseNum(0, 65535)
    trailer <- Gen.oneOf(true, false)
    ns <- Gen.chooseNum(0, 999999999)
    dev <- Gen.chooseNum(0, 65535)
    port <- Gen.chooseNum(0, 255)
  } yield {
    val l4 = PcapFixtures.l4Ports(sp, dp) ++
      (if (trailer) PcapFixtures.mmTrailer(BaseTs + 1, ns, dev, port)
       else Array.empty[Byte])
    PcapFixtures.ethernet(0x0800,
      PcapFixtures.ipv4(proto, Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2), l4))
  }
  private val genGarbage: Gen[Array[Byte]] =
    Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))
      .map(_.map(_.toByte).toArray))
  private val genFrames: Gen[List[(Array[Byte], Long)]] =
    Gen.listOfN(8, Gen.frequency(4 -> genRealFrame, 1 -> genGarbage)
      .map(f => (f, BaseTs)))

  property("legacy/pcapng decode parity across byte orders and tsresol") =
    forAll(genFrames, Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (frames, bigEndian, nsResol) =>
        val legacy = PcapParser.parseFile(PcapFixtures.pcapFile(frames)).toVector
        val ng = PcapParser.parseFile(
          PcapFixtures.pcapngFile(frames, nsResol = nsResol,
            bigEndian = bigEndian)).toVector
        legacy == ng
    }
}
