package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Real, dependency-free binary media codecs for the multimodal pipeline.
  *
  * The container ships no image/audio libraries, so instead of linking a
  * codec we implement two small REAL formats end-to-end:
  *
  *  - BMP: 24-bit uncompressed Windows bitmaps (BITMAPFILEHEADER +
  *    BITMAPINFOHEADER, BGR pixel rows padded to 4 bytes, bottom-up),
  *    the exact on-disk layout any image viewer reads.
  *  - WAV: RIFF/WAVE PCM 16-bit (fmt + data chunks, little-endian
  *    samples), the exact layout any audio tool reads.
  *
  * The decoders are strict header parsers over `Array[Byte]` — they
  * validate magic numbers, walk chunk structure, honor row padding and
  * bottom-up ordering, and extract actual pixel/sample data. Malformed
  * input throws `IllegalArgumentException` with a named reason (mirrors
  * the strict-mode policy of the pcap source, cf. reference main.rs:96
  * which panics instead).
  *
  * Everything here is pure JVM byte math: safe to call from executor-side
  * kernels, no per-row allocation beyond the decoded arrays, no codec
  * context to leak.
  */
object MediaCodec {

  /** Decoded 24bpp image: row-major top-down pixels as 0xRRGGBB ints. */
  final case class BmpImage(width: Int, height: Int, pixels: Array[Int]) {
    /** Mean Rec.601 luma over all pixels, 0..255. */
    def meanLuma: Double = {
      if (pixels.isEmpty) return 0.0
      var s = 0.0
      var i = 0
      while (i < pixels.length) {
        val p = pixels(i)
        s += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
        i += 1
      }
      s / pixels.length
    }

    /** Aspect-preserving box-downsample so max(w,h) <= maxDim; each output
      * pixel is the channel-wise mean of its source box (real pixel math,
      * not just dimension arithmetic). Identity when already small enough. */
    def boxResize(maxDim: Int): BmpImage = {
      val scale = math.min(1.0, maxDim.toDouble / math.max(width, height))
      if (scale >= 1.0) return this
      val w2 = math.max(1, math.round(width * scale).toInt)
      val h2 = math.max(1, math.round(height * scale).toInt)
      val out = new Array[Int](w2 * h2)
      var y = 0
      while (y < h2) {
        val y0 = y * height / h2
        val y1 = math.max(y0 + 1, (y + 1) * height / h2)
        var x = 0
        while (x < w2) {
          val x0 = x * width / w2
          val x1 = math.max(x0 + 1, (x + 1) * width / w2)
          var r = 0; var g = 0; var b = 0; var n = 0
          var yy = y0
          while (yy < y1) {
            var xx = x0
            while (xx < x1) {
              val p = pixels(yy * width + xx)
              r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
              n += 1; xx += 1
            }
            yy += 1
          }
          out(y * w2 + x) = ((r / n) << 16) | ((g / n) << 8) | (b / n)
          x += 1
        }
        y += 1
      }
      BmpImage(w2, h2, out)
    }
  }

  /** Decoded PCM16 audio. */
  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                            samples: Array[Short]) {
    def nSamples: Int = samples.length / channels
    def durationMs: Double = nSamples * 1000.0 / sampleRate
    /** Root-mean-square amplitude normalized to 0..1 of full scale. */
    def rms: Double = {
      if (samples.isEmpty) return 0.0
      var s = 0.0
      var i = 0
      while (i < samples.length) { val v = samples(i) / 32768.0; s += v * v; i += 1 }
      math.sqrt(s / samples.length)
    }
  }

  private def bmpRowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Write a real 24bpp BMP. `pix(x, y)` returns 0xRRGGBB; (0,0) is the
    * TOP-left (we store rows bottom-up as the format requires). */
  def encodeBmp(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "bmp: non-positive dimensions")
    val stride = bmpRowStride(width)
    val dataSize = stride * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize)           // file size
    buf.putInt(0)                       // reserved
    buf.putInt(54)                      // pixel-data offset
    buf.putInt(40)                      // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height)                  // positive => bottom-up
    buf.putShort(1)                     // planes
    buf.putShort(24)                    // bpp
    buf.putInt(0)                       // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835)       // 72 dpi in px/metre
    buf.putInt(0).putInt(0)             // palette sizes (none)
    var y = height - 1                  // bottom-up rows
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pix(x, y)
        buf.put((p & 0xff).toByte)            // B
        buf.put(((p >> 8) & 0xff).toByte)     // G
        buf.put(((p >> 16) & 0xff).toByte)    // R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Strict 24bpp BMP parser (BI_RGB only — the layout encodeBmp writes and
    * the overwhelmingly common uncompressed case). All bounds arithmetic
    * runs in Long: a hostile header (width ≈ 2^30, giant pixOff) must hit
    * the named requires below, never an Int overflow that slips past them
    * into a negative-size allocation or a multi-GB Array. */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= 54, s"bmp: truncated header (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'B' && buf.get(1) == 'M', "bmp: bad magic (expected 'BM')")
    val pixOff = buf.getInt(10)
    val hdrSize = buf.getInt(14)
    require(hdrSize >= 40, s"bmp: unsupported header size $hdrSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    require(width > 0, s"bmp: non-positive width $width")
    require(rawHeight != 0, "bmp: zero height")
    require(bpp == 24, s"bmp: unsupported bpp $bpp (only 24)")
    require(compression == 0, s"bmp: unsupported compression $compression (only BI_RGB)")
    require(pixOff >= 54 && pixOff <= bytes.length,
      s"bmp: pixel-data offset $pixOff outside [54, ${bytes.length}]")
    val bottomUp = rawHeight > 0
    // abs in LONG: math.abs(Int.MinValue) stays negative in Int, which
    // would flip strideL*height negative and sail past the truncation
    // require below (then NegativeArraySizeException or a malformed
    // zero-pixel image instead of the contractual named require).
    val heightL = math.abs(rawHeight.toLong)
    val strideL = (width.toLong * 3 + 3) & ~3L
    require(pixOff + strideL * heightL <= bytes.length,
      s"bmp: truncated pixel data (need ${pixOff + strideL * heightL}, have ${bytes.length})")
    val height = heightL.toInt // fits: strideL >= 4, so heightL <= bytes.length / 4
    val stride = strideL.toInt // fits: bounded by bytes.length above
    val pixels = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val srcRow = if (bottomUp) height - 1 - row else row
      var x = 0
      var off = pixOff + srcRow * stride
      while (x < width) {
        val b = bytes(off) & 0xff
        val g = bytes(off + 1) & 0xff
        val r = bytes(off + 2) & 0xff
        pixels(row * width + x) = (r << 16) | (g << 8) | b
        x += 1; off += 3
      }
      row += 1
    }
    BmpImage(width, height, pixels)
  }

  /** Write a real RIFF/WAVE PCM16 mono file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, "wav: non-positive sample rate")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                      // PCM fmt chunk size
    buf.putShort(1)                     // audio format = PCM
    buf.putShort(1)                     // channels
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)          // byte rate
    buf.putShort(2)                     // block align
    buf.putShort(16)                    // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Strict RIFF/WAVE parser: walks chunks (skipping unknown ones, as the
    * format requires — real files carry LIST/INFO etc.), requires PCM16. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 12, s"wav: truncated RIFF header (${bytes.length} bytes)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    require(fourCC(0) == "RIFF", "wav: bad magic (expected RIFF)")
    require(fourCC(8) == "WAVE", "wav: not a WAVE file")
    // chunk walk in Long: a hostile size (e.g. 0x7ffffff8) must hit the
    // named overrun require, never wrap Int and walk off backwards
    var off = 12L
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1L; var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = fourCC(off.toInt)
      val sz = buf.getInt(off.toInt + 4).toLong & 0xffffffffL // u32 size
      require(off + 8 + sz <= bytes.length, s"wav: chunk '$id' overruns file")
      id match {
        case "fmt " =>
          require(sz >= 16, s"wav: fmt chunk too small ($sz)")
          val o = off.toInt
          val fmt = buf.getShort(o + 8).toInt
          require(fmt == 1, s"wav: unsupported audio format $fmt (only PCM)")
          channels = buf.getShort(o + 10).toInt
          sampleRate = buf.getInt(o + 12)
          bits = buf.getShort(o + 22).toInt
          require(bits == 16, s"wav: unsupported bit depth $bits (only 16)")
          require(channels >= 1, s"wav: bad channel count $channels")
        case "data" =>
          dataOff = off + 8; dataLen = sz.toInt // fits: bounded by file length
        case _ => // skip unknown chunk (word-aligned)
      }
      off += 8 + sz + (sz & 1)
    }
    require(sampleRate > 0, "wav: missing fmt chunk")
    require(dataOff >= 0, "wav: missing data chunk")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = buf.getShort(dataOff.toInt + i * 2); i += 1 }
    WavAudio(sampleRate, channels, bits, samples)
  }
}
