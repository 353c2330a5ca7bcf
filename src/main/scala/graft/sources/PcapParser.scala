package graft.sources

/** Pure-Scala legacy-pcap frame decoder — the reference's entire job
  * re-expressed as a deterministic byte-slice -> row function
  * (SURVEY.md §2.A, A1–A9; semantics cited per function below from
  * /root/reference/src/main.rs).
  *
  * Deliberate divergence from the reference: every read is bounds-checked.
  * The reference panics on truncated frames (main.rs:190-191
  * `try_into().expect`) and on snaplen-truncated captures (it indexes the
  * buffer with `origlen`, main.rs:97); we yield NULL fields instead
  * (SURVEY.md §2.A "fidelity traps" #1, FIXTURES.md §2 case 12).
  *
  * Scale note: the decoder is a pure function over a byte slice with no
  * allocation beyond the output row — usable inside `flatMap` /
  * `mapPartitions` over a `binaryFile` scan, one task per capture file
  * (legacy pcap has no record sync markers, so file granularity is the
  * correct split unit — SURVEY.md §7 M2 / risk #4).
  */
object PcapParser {

  /** One decoded packet — the reference's 9-column Packet struct
    * (main.rs:5-16) plus a packet index for deterministic ordering.
    * Unsigned reference types widen to the next signed Spark type
    * (SURVEY.md §1.4). */
  final case class Packet(
      pkt_idx: Long,
      src_ip: Option[String],
      dst_ip: Option[String],
      len: Option[Long],          // u32 origlen -> long
      protocol: Option[String],
      src_port: Option[Int],      // u16 -> int
      dst_port: Option[Int],
      mm_ts: Option[Long],        // epoch nanoseconds (main.rs:177)
      mm_id: Option[Int],         // u16 -> int
      mm_port: Option[Int])       // u8 -> int

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off + 3) & 0xffL) << 24) | ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 1) & 0xffL) << 8) | (b(off) & 0xffL)
  private def le16(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  /** TCP/UDP port extraction (main.rs:213-231): BE u16 at L4 offsets 0/2. */
  private def parsePorts(b: Array[Byte], off: Int): (Option[Int], Option[Int]) =
    if (off + 4 <= b.length) (Some(be16(b, off)), Some(be16(b, off + 2)))
    else (None, None)

  /** IPv4 header decode (main.rs:185-211): IHL from the low nibble of
    * byte 0; protocol at byte 9; src/dst addresses at bytes 12-15/16-19
    * formatted dotted-quad (main.rs:193-196); dispatch 1/2/6/17 ->
    * ICMP/IGMP/TCP/UDP (main.rs:198-210), anything else leaves protocol
    * NULL. No checksum/fragment/option handling, as in the reference.
    * `wantIps = false` (column pruned at the scan) skips the dotted-quad
    * string formatting — the dominant per-packet cost. */
  private def parseIpv4(b: Array[Byte], off: Int, p: Packet, wantIps: Boolean): Packet = {
    if (off + 20 > b.length) return p
    val ihl = (b(off) & 0x0f) * 4
    val proto = b(off + 9) & 0xff
    def quad(o: Int) = s"${b(o) & 0xff}.${b(o + 1) & 0xff}.${b(o + 2) & 0xff}.${b(o + 3) & 0xff}"
    val withIps =
      if (wantIps) p.copy(src_ip = Some(quad(off + 12)), dst_ip = Some(quad(off + 16)))
      else p
    proto match {
      case 1 => withIps.copy(protocol = Some("ICMP"))
      case 2 => withIps.copy(protocol = Some("IGMP"))
      case 6 =>
        val (s, d) = parsePorts(b, off + ihl)
        withIps.copy(protocol = Some("TCP"), src_port = s, dst_port = d)
      case 17 =>
        val (s, d) = parsePorts(b, off + ihl)
        withIps.copy(protocol = Some("UDP"), src_port = s, dst_port = d)
      case _ => withIps // protocol number not mapped -> name stays NULL
    }
  }

  /** IPv6 header decode (r7 — EXTENSION past the reference, which leaves
    * every field NULL for 0x86DD frames, main.rs:234-252; real captures
    * are full of IPv6, so a user migrating hits this immediately). Fixed
    * 40-byte header: next-header at byte 6, src at 8–23, dst at 24–39,
    * rendered as full-form lowercase-hex groups (unambiguous, no ::
    * compression — the join-key property matters more than RFC 5952
    * prettiness: equal addresses MUST render equal). Extension headers
    * (hop-by-hop 0, routing 43, fragment 44, dest-opts 60) are walked —
    * bounded at 8, each (next, (len+1)·8) except fragment's fixed 8 —
    * to reach TCP/UDP/ICMPv6; an unmapped or truncated chain leaves
    * protocol NULL, exactly the IPv4 posture. */
  private def parseIpv6(b: Array[Byte], off: Int, p: Packet, wantIps: Boolean): Packet = {
    if (off + 40 > b.length) return p
    def addr(o: Int) =
      (0 until 8).map(i => Integer.toHexString(be16(b, o + 2 * i))).mkString(":")
    val withIps =
      if (wantIps) p.copy(src_ip = Some(addr(off + 8)), dst_ip = Some(addr(off + 24)))
      else p
    var next = b(off + 6) & 0xff
    var l4 = off + 40
    var hops = 0
    while ((next == 0 || next == 43 || next == 44 || next == 60) &&
           hops < 8 && l4 + 8 <= b.length) {
      val n = b(l4) & 0xff
      val len = if (next == 44) 8 else ((b(l4 + 1) & 0xff) + 1) * 8
      next = n
      l4 += len
      hops += 1
    }
    next match {
      case 6 =>
        val (s, d) = parsePorts(b, l4)
        withIps.copy(protocol = Some("TCP"), src_port = s, dst_port = d)
      case 17 =>
        val (s, d) = parsePorts(b, l4)
        withIps.copy(protocol = Some("UDP"), src_port = s, dst_port = d)
      case 58 => withIps.copy(protocol = Some("ICMPv6"))
      case _ => withIps
    }
  }

  /** Ethernet II decode (main.rs:234-252): EtherType at bytes 12-13;
    * 0x0800 -> IPv4. r7 EXTENSIONS past the reference (which handles one
    * 802.1Q tag then gives up): the VLAN tag STACK is walked — 0x8100 /
    * 0x88A8 QinQ / legacy 0x9100, bounded at 4 tags — and 0x86DD
    * dispatches to the IPv6 decoder. ARP and everything else still
    * leaves fields NULL. MACs deliberately not extracted
    * (main.rs:235-236). */
  def parseEthernet(b: Array[Byte], p: Packet, wantIps: Boolean = true): Packet = {
    if (b.length < 14) return p
    var off = 12
    var tags = 0
    var et = be16(b, off)
    while ((et == 0x8100 || et == 0x88a8 || et == 0x9100) &&
           tags < 4 && off + 6 <= b.length) {
      off += 4
      et = be16(b, off)
      tags += 1
    }
    et match {
      case 0x0800 => parseIpv4(b, off + 2, p, wantIps)
      case 0x86dd => parseIpv6(b, off + 2, p, wantIps)
      case _ => p
    }
  }

  /** Single Metamako trailer probe at `end` (exclusive) — main.rs:157-183.
    * Valid iff |pcap_ts_sec - mm_s| < 300 and mm_ns < 1e9 (main.rs:174).
    * Returns the trailer fields without mutating — the CALLER decides
    * overwrite order (first-device-wins, main.rs:127). */
  private def probeTrailer(b: Array[Byte], end: Int, pcapTsSec: Long): Option[(Long, Int, Int)] = {
    if (end < 16 || end > b.length) return None
    val s = be32(b, end - 12).toInt  // BE i32 seconds
    val ns = be32(b, end - 8).toInt  // BE i32 nanoseconds
    // NB: the reference only checks ns < 1e9, NOT ns >= 0 (main.rs:174) —
    // a negative i32 ns passes and is added signed; replicated faithfully.
    if (math.abs(pcapTsSec - s) < 300 && ns < 1000000000) {
      val id = be16(b, end - 3)
      val port = b(end - 1) & 0xff
      Some((s.toLong * 1000000000L + ns, id, port))
    } else None
  }

  /** Multi-trailer scan (main.rs:128-148): probe at the full length; on a
    * hit, keep scanning backwards for stacked trailers (16-byte steps on
    * hits, 1-byte slide on misses — main.rs:138) and let each deeper hit
    * overwrite, so the FIRST-appended (innermost) trailer wins
    * (main.rs:127). If the probe at full length misses, retry once
    * assuming a trailing 4-byte FCS (main.rs:141-146). Scans against the
    * actual buffer length, never past it (divergence: reference indexes
    * with origlen and can panic). */
  def extractTrailers(b: Array[Byte], pcapTsSec: Long, p: Packet): Packet = {
    val len = b.length
    def scanFrom(end: Int): Option[(Long, Int, Int)] =
      probeTrailer(b, end, pcapTsSec) match {
        case None => None
        case Some(first) =>
          var best = first
          var i = 16 // bytes consumed from the tail so far
          while (end - i >= 16) {
            probeTrailer(b, end - i, pcapTsSec) match {
              case Some(t) => best = t; i += 16
              case None => i += 1
            }
          }
          Some(best)
      }
    val hit = scanFrom(len).orElse(scanFrom(len - 4)) // FCS retry
    hit.fold(p) { case (ts, id, port) =>
      p.copy(mm_ts = Some(ts), mm_id = Some(id), mm_port = Some(port))
    }
  }

  /** Which column groups a consumer actually needs — the scan-side pruning
    * contract. `ips` gates dotted-quad formatting, `net` the whole
    * Ethernet/IPv4/L4 decode, `trailers` the Metamako tail scan. Full
    * decode = Wants(true, true, true). */
  final case class Wants(ips: Boolean = true, net: Boolean = true, trailers: Boolean = true)
  val WantsAll: Wants = Wants()

  /** Full per-record pipeline (main() body, main.rs:89-101): trailer scan
    * guarded by origlen >= 16 (main.rs:92), then Ethernet decode. Pruned
    * column groups (`wants`) skip their decode work entirely — the fields
    * stay None, which the pruned scan never reads. */
  def decodeRecord(pktIdx: Long, data: Array[Byte], tsSec: Long, origLen: Long,
                   wants: Wants = WantsAll): Packet = {
    val base = Packet(pktIdx, None, None, Some(origLen), None, None, None, None, None, None)
    val withMm =
      if (wants.trailers && origLen >= 16) extractTrailers(data, tsSec, base) else base
    if (wants.net) parseEthernet(data, withMm, wants.ips) else withMm
  }

  // ---- legacy pcap container (main.rs:64-66, 83-118) ---------------------

  private val MagicBe = 0xa1b2c3d4L
  private val MagicLe = 0xd4c3b2a1L
  private val MagicBeNs = 0xa1b23c4dL
  private val MagicLeNs = 0x4d3cb2a1L

  /** Raised by strict-mode parses on malformed captures: unrecognized
    * magic, truncated global header, truncated record, or a malformed
    * pcapng block. The message always carries the capture's name/path —
    * at 100 TB a silently-skipped capture is undetectable data loss. */
  final class PcapFormatException(msg: String) extends RuntimeException(msg)

  /** Iterate the records of one capture byte buffer, sniffing the
    * container format from its magic: legacy pcap (both byte orders, the
    * nanosecond-magic variant included — ts_sec stays seconds, so the
    * trailer heuristic is unchanged, SURVEY.md §2.A trap #5) or pcapng
    * (dispatched to [[parsePcapng]] — the format the reference refuses
    * with `unreachable!()` at main.rs:108; we read it). The reference's
    * panics become a mode switch: `strict = true` raises a
    * [[PcapFormatException]] naming the capture on an unrecognized magic,
    * a truncated global header, or a truncated/corrupt record;
    * `strict = false` (the salvage mode) ends the iteration instead,
    * keeping every record that decoded cleanly. */
  def parseFile(bytes: Array[Byte], wants: Wants = WantsAll,
                strict: Boolean = false, name: String = "<buffer>"): Iterator[Packet] =
    parseFileRange(bytes, wants, strict, name, 0L, Long.MaxValue, moreAfterBuffer = false)

  /** Is this buffer (or its first bytes) a pcapng capture? */
  def sniffPcapng(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && le32(bytes, 0) == PcapngShb

  /** The snaplen a legacy pcap global header declares, honoring its byte
    * order; None when the magic isn't legacy pcap (pcapng, junk, or a
    * short buffer). Lets the DSv2 source size a chunk's prefetch window —
    * a record starting inside a chunk spans at most 16 + snaplen bytes. */
  def legacySnapLen(head: Array[Byte]): Option[Long] = {
    if (head.length < 24) return None
    le32(head, 0) match {
      case MagicBe | MagicBeNs => Some(le32(head, 16))
      case MagicLe | MagicLeNs => Some(be32(head, 16))
      case _ => None
    }
  }

  /** The record byte order a legacy global header declares: Some(true)
    * when reads must swap (file written big-endian), None when the magic
    * isn't legacy pcap at all (pcapng, junk, short buffer). The r8
    * seek-skim carries this so chunk decoding needs no header re-probe. */
  def legacyByteOrder(head: Array[Byte]): Option[Boolean] = {
    if (head.length < 24) return None
    le32(head, 0) match {
      case MagicBe | MagicBeNs => Some(false)
      case MagicLe | MagicLeNs => Some(true)
      case _ => None
    }
  }

  /** CHUNKED parse (r7 — intra-file parallelism for large captures):
    * decode only the records whose first byte lies in
    * `[rangeStart, rangeEnd)`, with GLOBAL `pkt_idx` values, so the union
    * of the chunk reads of one capture is byte-identical to the unsplit
    * read. A record belongs to exactly the chunk containing its start.
    *
    * Legacy pcap has no record sync markers, so a mid-file offset cannot
    * be decoded in isolation — and SPECULATIVE resync (scan for a
    * plausible header, validate N records ahead) was rejected: it cannot
    * recover the global record ordinal `pkt_idx` at all, and a crafted or
    * unlucky payload embedding a plausible header misframes silently.
    * Instead every chunk SKIMS the file prefix: a framing-only walk
    * (16-byte header arithmetic, no payload copy, no network decode, no
    * trailer scan — the actual per-record cost) that lands on its range
    * start EXACTLY, counting records on the way. Decode CPU — the
    * bottleneck; the reference is CPU-bound single-threaded — then
    * parallelizes per chunk, while skim work sums to C²/2 header walks
    * costing a few % of one decode pass. pcapng chunks skim the same way,
    * additionally replaying SHB/IDB section state (byte order, tsresol,
    * snaplens) that mid-file packets depend on.
    *
    * `moreAfterBuffer = true` says the buffer is a PREFIX of the capture
    * (the caller prefetched `[0, rangeEnd + straddle)`): running out of
    * buffer then just ends the chunk instead of raising "truncated", and
    * a record that overruns the prefetch window (declared length past the
    * snaplen the window was sized by) is a named strict error. Structural
    * strict errors in the skimmed prefix raise exactly as the unsplit
    * read would — a malformed capture names itself from every chunk. */
  def parseFileRange(bytes: Array[Byte], wants: Wants, strict: Boolean, name: String,
                     rangeStart: Long, rangeEnd: Long,
                     moreAfterBuffer: Boolean): Iterator[Packet] = {
    def fail(why: String): Nothing = throw new PcapFormatException(s"$name: $why")
    if (sniffPcapng(bytes))
      return parsePcapng(bytes, wants, strict, name, rangeStart, rangeEnd)
    if (bytes.length < 24) {
      if (strict) fail(s"truncated pcap global header (${bytes.length} bytes < 24)")
      return Iterator.empty
    }
    val magic = le32(bytes, 0)
    val (swapped, ok) = magic match {
      case MagicBe | MagicBeNs => (false, true)   // file written LE (we read LE)
      case MagicLe | MagicLeNs => (true, true)    // file written BE
      case _ => (false, false)                    // unknown container: stop
    }
    if (!ok) {
      if (strict) fail(f"unrecognized pcap magic 0x$magic%08x — not a capture " +
        "(read with option(\"mode\", \"permissive\") to skip unreadable files)")
      return Iterator.empty
    }
    recordsIterator(bytes, swapped, startOff = 24, baseIdx = 0L,
      rangeStart, rangeEnd, moreAfterBuffer, wants, strict, name)
  }

  /** Parse a buffer holding legacy pcap RECORDS ONLY (no 24-byte global
    * header) with absolute record ordinals from `baseIdx` — the decode
    * half of the r8 seek-skim chunk reader: the skim walks framing
    * headers through a bounded window to find a chunk's exact byte
    * range, then hands JUST that range here. `swapped` carries the byte
    * order the capture's global header declared. */
  def parseRecords(bytes: Array[Byte], swapped: Boolean, baseIdx: Long,
                   wants: Wants, strict: Boolean, name: String): Iterator[Packet] =
    recordsIterator(bytes, swapped, startOff = 0, baseIdx,
      rangeStart = 0L, rangeEnd = Long.MaxValue, moreAfterBuffer = false,
      wants, strict, name)

  private def recordsIterator(bytes: Array[Byte], swapped: Boolean,
                              startOff: Int, baseIdx: Long,
                              rangeStart: Long, rangeEnd: Long,
                              moreAfterBuffer: Boolean, wants: Wants,
                              strict: Boolean, name: String): Iterator[Packet] = {
    def fail(why: String): Nothing = throw new PcapFormatException(s"$name: $why")
    def u32(off: Int): Long = if (swapped) be32(bytes, off) else le32(bytes, off)
    new Iterator[Packet] {
      private var off = startOff
      private var idx = baseIdx
      private var pending: Packet = _
      private var exhausted = false

      /** Next record in [rangeStart, rangeEnd), skimming earlier ones;
        * null once the range (or the capture) is exhausted. */
      private def advance(): Packet = {
        while (true) {
          if (off >= rangeEnd) return null // next chunk's record
          val rem = bytes.length - off
          if (rem < 16) {
            if (rem == 0 || moreAfterBuffer) return null // clean EOF / prefix end
            if (strict) fail(
              s"truncated record header after record ${idx - 1} at byte $off ($rem bytes < 16)")
            return null
          }
          val tsSec = u32(off)
          // incl_len is a u32: `.toInt` on values >= 2^31 wraps negative and a
          // negative length walks `off` backwards (non-terminating iterator) or
          // crashes copyOfRange. Clamp to the bytes actually present instead: a
          // record claiming more than remains is truncated — emit what's there,
          // after which `off` lands at bytes.length and iteration ends. `off`
          // therefore always advances by >= 16, so the iterator terminates.
          val rawIncl = u32(off + 8)
          val avail = (bytes.length - off - 16).toLong
          if (rawIncl > avail) {
            if (moreAfterBuffer) {
              // the prefetch window was sized by the header's snaplen, so
              // only a record VIOLATING its capture's snaplen lands here
              if (strict) fail(
                s"record $idx at byte $off claims $rawIncl bytes, past the chunk " +
                  "prefetch window sized by the capture's declared snaplen " +
                  "(corrupt record, or a snaplen-violating writer)")
              return null
            }
            if (strict) fail(
              s"record $idx at byte $off claims $rawIncl bytes but only $avail remain " +
                "(truncated or corrupt capture)")
          }
          val inclLen = math.min(rawIncl, avail).toInt
          val origLen = u32(off + 12)
          val start = off
          off += 16 + inclLen
          val i = idx
          idx += 1
          if (start >= rangeStart) { // ours: decode. Earlier: skim (framing only)
            val data = java.util.Arrays.copyOfRange(bytes, start + 16, start + 16 + inclLen)
            return decodeRecord(i, data, tsSec, origLen, wants)
          }
        }
        null // unreachable
      }

      def hasNext: Boolean = {
        if (pending == null && !exhausted) {
          pending = advance()
          exhausted = pending == null
        }
        pending != null
      }
      def next(): Packet = {
        if (!hasNext) throw new NoSuchElementException("pcap iterator exhausted")
        val p = pending
        pending = null
        p
      }
    }
  }

  // ---- pcapng container ----------------------------------------------------
  // Beyond the reference: main.rs:108 hits `unreachable!()` on the format
  // every modern tcpdump/Wireshark writes by default. Same 9-column row out.

  /** Section Header Block type — its byte sequence 0x0A0D0D0A is an endian
    * palindrome by design, so it sniffs identically in either byte order. */
  private val PcapngShb = 0x0a0d0d0aL
  /** Byte-order magic inside the SHB body. */
  private val PcapngBom = 0x1a2b3c4dL
  private val IdbType = 0x00000001L
  private val SpbType = 0x00000003L
  private val EpbType = 0x00000006L

  /** Timestamp units/second from an IDB's if_tsresol option (code 9):
    * power of 10, or power of 2 when the MSB is set; default microseconds.
    * Walks the option list from `o` (first option) to `end` (exclusive). */
  private def idbUnitsPerSec(b: Array[Byte], o0: Int, end: Int, swapped: Boolean): Long = {
    def u16(o: Int) = if (swapped) be16(b, o) else le16(b, o)
    var o = o0
    while (o + 4 <= end) {
      val code = u16(o)
      val len = u16(o + 2)
      if (code == 0) return 1000000L // opt_endofopt
      if (code == 9 && len >= 1 && o + 4 < end) {
        val v = b(o + 4) & 0xff
        if ((v & 0x80) != 0) return 1L << math.min(v & 0x7f, 62)
        var r = 1L
        var i = 0
        while (i < math.min(v, 18)) { r *= 10; i += 1 }
        return r
      }
      o += 4 + ((len + 3) & ~3)
    }
    1000000L
  }

  /** Iterate the packets of one pcapng byte buffer: walks the block chain
    * (SHB / IDB / EPB / SPB; unknown block types skipped, as the spec
    * requires), honoring per-section byte order (the BOM in each SHB) and
    * per-interface if_tsresol, and feeds every packet through the same
    * [[decodeRecord]] pipeline as legacy pcap. SPB carries no timestamp,
    * so its trailer-heuristic window anchors at 0 — Metamako trailers in
    * SPB-only captures are not recovered (they need the ±300 s check).
    * Strict mode raises a [[PcapFormatException]] naming the capture on a
    * bad SHB byte-order magic, a block overrunning the file, a non-aligned
    * or impossible block length, an EPB referencing an undeclared
    * interface, or an EPB claiming more captured bytes than its block
    * holds; permissive mode ends the iteration, keeping clean records. */
  def parsePcapng(bytes: Array[Byte], wants: Wants = WantsAll,
                  strict: Boolean = false, name: String = "<buffer>",
                  rangeStart: Long = 0L, rangeEnd: Long = Long.MaxValue): Iterator[Packet] =
    new Iterator[Packet] {
      private def fail(why: String): Nothing =
        throw new PcapFormatException(s"$name: $why")
      private var off = 0
      private var idx = 0L
      private var swapped = false
      private var inSection = false
      private val unitsPerSec = scala.collection.mutable.ArrayBuffer.empty[Long]
      private val snapLens = scala.collection.mutable.ArrayBuffer.empty[Long]
      private var pending: Packet = null
      private var exhausted = false

      private def u32(o: Int): Long = if (swapped) be32(bytes, o) else le32(bytes, o)

      /** Advance to the next packet block; null at clean (or salvaged) EOF. */
      @annotation.tailrec
      private def advance(): Packet = {
        if (off >= rangeEnd) return null // next chunk's blocks
        if (off == bytes.length) return null
        if (off + 12 > bytes.length) {
          if (strict) fail(s"truncated pcapng block header at byte $off " +
            s"(${bytes.length - off} bytes < 12)")
          return null
        }
        val blockStart = off
        val isShb = le32(bytes, blockStart) == PcapngShb
        // SHB starts a (new) section and resets endianness + interfaces
        if (isShb) {
          val bomLe = le32(bytes, off + 8)
          if (bomLe == PcapngBom) swapped = false
          else if (be32(bytes, off + 8) == PcapngBom) swapped = true
          else {
            if (strict) fail(f"pcapng: bad byte-order magic 0x$bomLe%08x in " +
              s"section header at byte $off")
            return null
          }
          inSection = true
          unitsPerSec.clear()
          snapLens.clear()
        } else if (!inSection) {
          if (strict) fail("pcapng: first block is not a section header")
          return null
        }
        val totalLen = u32(blockStart + 4)
        if (totalLen < 12 || (totalLen & 3) != 0 || blockStart + totalLen > bytes.length) {
          if (strict) fail(s"pcapng: block at byte $blockStart declares impossible " +
            s"length $totalLen (file holds ${bytes.length - blockStart} more bytes)")
          return null
        }
        val body = blockStart + 8
        val bodyEnd = blockStart + totalLen.toInt - 4
        val btype = if (isShb) PcapngShb else u32(blockStart)
        off = blockStart + totalLen.toInt
        btype match {
          case IdbType =>
            // linktype u16 + reserved u16 + snaplen u32, then options
            unitsPerSec += (if (bodyEnd - body >= 8)
              idbUnitsPerSec(bytes, body + 8, bodyEnd, swapped) else 1000000L)
            // snaplen 0 means "no limit" per the spec
            snapLens += (if (bodyEnd - body >= 8) {
              val s = u32(body + 4); if (s == 0) Long.MaxValue else s
            } else Long.MaxValue)
            advance()
          case EpbType =>
            if (bodyEnd - body < 20) {
              if (strict) fail(s"pcapng: EPB at byte ${body - 8} too small")
              return null
            }
            val iface = u32(body).toInt
            val ts = (u32(body + 4) << 32) | u32(body + 8)
            val capLen = u32(body + 12)
            val origLen = u32(body + 16)
            val room = (bodyEnd - body - 20).toLong
            if (strict && capLen > room) fail(s"pcapng: EPB packet $idx claims " +
              s"$capLen captured bytes but its block holds $room")
            val ups =
              if (iface >= 0 && iface < unitsPerSec.length) unitsPerSec(iface)
              else if (strict) fail(s"pcapng: EPB packet $idx references " +
                s"undeclared interface $iface (${unitsPerSec.length} declared)")
              else 1000000L
            if (blockStart < rangeStart) { idx += 1; advance() } // skim: framing only
            else {
              val take = math.min(capLen, room).toInt
              val data = java.util.Arrays.copyOfRange(bytes, body + 20, body + 20 + take)
              val p = decodeRecord(idx, data, ts / ups, origLen, wants)
              idx += 1
              p
            }
          case SpbType =>
            if (bodyEnd - body < 4) {
              if (strict) fail(s"pcapng: SPB at byte ${body - 8} too small")
              return null
            }
            // spec (§4.4): packet blocks may only follow an IDB in their
            // section; an SPB with no interface declared would otherwise
            // fall back to an unbounded snaplen — mirror the EPB
            // undeclared-interface check in strict mode
            if (strict && snapLens.isEmpty)
              fail(s"pcapng: SPB packet $idx before any interface " +
                "description block in its section")
            val origLen = u32(body)
            // spec: SPB captured length = min(orig_len, interface 0's
            // snaplen) — the block body is padded to 4 bytes, so without
            // the snaplen bound a snaplen-truncated packet would absorb
            // its pad bytes as frame data
            val snap = if (snapLens.nonEmpty) snapLens(0) else Long.MaxValue
            if (blockStart < rangeStart) { idx += 1; advance() } // skim: framing only
            else {
              val take = math.min(math.min(origLen, snap),
                (bodyEnd - body - 4).toLong).toInt
              val data = java.util.Arrays.copyOfRange(bytes, body + 4, body + 4 + take)
              val p = decodeRecord(idx, data, 0L, origLen, wants) // SPB: no timestamp
              idx += 1
              p
            }
          case _ => advance() // SHB handled above; unknown blocks skipped
        }
      }

      def hasNext: Boolean = {
        if (pending == null && !exhausted) {
          pending = advance()
          exhausted = pending == null
        }
        pending != null
      }
      def next(): Packet = {
        if (!hasNext) throw new NoSuchElementException("pcapng iterator exhausted")
        val p = pending
        pending = null
        p
      }
    }
}
