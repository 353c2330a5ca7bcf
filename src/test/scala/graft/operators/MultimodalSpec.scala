package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkTestBase
import graft.functions.MediaCodec

/** Pins the REAL multimodal decode path: strict BMP/WAV parsers against
  * hand-computed golden values, chunk walking over hand-built byte
  * literals (not just our own writer's output), malformed-input errors,
  * and the end-to-end encode→decode pipeline invariants. */
class MultimodalSpec extends SparkTestBase {

  test("bmp golden: 2x2 roundtrip with hand-computed Rec.601 mean luma") {
    // (0,0)=red (1,0)=green / (0,1)=blue (1,1)=white
    val px = Map((0, 0) -> 0xff0000, (1, 0) -> 0x00ff00,
                 (0, 1) -> 0x0000ff, (1, 1) -> 0xffffff)
    val bytes = MediaCodec.encodeBmp(2, 2, (x, y) => px((x, y)))
    // hand-checked layout: 54-byte header + 2 rows of stride 8 = 70 bytes
    assert(bytes.length == 70)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    val img = MediaCodec.decodeBmp(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    // luma: red 76.245 + green 149.685 + blue 29.07 + white 255 = 510 → /4
    assert(math.abs(img.meanLuma - 127.5) < 1e-9)
  }

  test("bmp golden: hand-built 1x1 byte literal parses (not writer-roundtrip)") {
    val buf = ByteBuffer.allocate(58).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(58).putInt(0).putInt(54)
    buf.putInt(40).putInt(1).putInt(1).putShort(1).putShort(24)
    buf.putInt(0).putInt(4).putInt(2835).putInt(2835).putInt(0).putInt(0)
    buf.put(200.toByte).put(150.toByte).put(100.toByte).put(0.toByte) // B,G,R,pad
    val img = MediaCodec.decodeBmp(buf.array())
    assert(img.width == 1 && img.height == 1)
    assert(img.pixels(0) == ((100 << 16) | (150 << 8) | 200))
  }

  test("bmp: top-down (negative height) variant decodes with same pixel order") {
    val up = MediaCodec.encodeBmp(2, 1, (x, _) => if (x == 0) 0x112233 else 0x445566)
    // flip to top-down: height := -1
    val down = up.clone()
    ByteBuffer.wrap(down).order(ByteOrder.LITTLE_ENDIAN).putInt(22, -1)
    assert(MediaCodec.decodeBmp(up).pixels.toSeq ==
           MediaCodec.decodeBmp(down).pixels.toSeq)
  }

  test("bmp boxResize: 4x2 down to 2x1 averages the right boxes") {
    // left box pixels 10/20/30/40 gray, right box 100/120/140/160 gray
    val vals = Array(Array(10, 20, 100, 120), Array(30, 40, 140, 160))
    val img = MediaCodec.decodeBmp(MediaCodec.encodeBmp(4, 2, (x, y) => {
      val v = vals(y)(x); (v << 16) | (v << 8) | v
    }))
    val r = img.boxResize(2)
    assert(r.width == 2 && r.height == 1)
    assert(r.pixels(0) == ((25 << 16) | (25 << 8) | 25))    // mean(10,20,30,40)
    assert(r.pixels(1) == ((130 << 16) | (130 << 8) | 130)) // mean(100..160)
  }

  test("bmp: malformed inputs throw named errors") {
    val badMagic = intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp(Array.fill[Byte](60)('X'.toByte))
    }
    assert(badMagic.getMessage.contains("bad magic"))
    val truncated = intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp(MediaCodec.encodeBmp(4, 4, (_, _) => 0).take(60))
    }
    assert(truncated.getMessage.contains("truncated pixel data"))
    // height = Int.MinValue: math.abs stays negative in Int, which would
    // turn the bounds product negative and slip past the require — the
    // Long-domain abs must keep this on the named-require path
    val bmp = MediaCodec.encodeBmp(4, 4, (_, _) => 0)
    java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, Int.MinValue)
    val minHeight = intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp(bmp)
    }
    assert(minHeight.getMessage.contains("truncated pixel data"))
  }

  test("wav golden: PCM16 roundtrip with hand-computed RMS") {
    val samples = Array[Short](0, 16384, -16384, 32767)
    val bytes = MediaCodec.encodeWav(8000, samples)
    assert(bytes.length == 44 + 8)
    val wav = MediaCodec.decodeWav(bytes)
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == samples.toSeq)
    // rms of (0, .5, -.5, 32767/32768) = sqrt((0+.25+.25+.99994)/4) ≈ .612367
    assert(math.abs(wav.rms - 0.612367) < 1e-4)
    assert(math.abs(wav.durationMs - 0.5) < 1e-9)
  }

  test("wav: parser walks unknown chunks before data (hand-built literal)") {
    val samples = Array[Short](1000, -1000)
    val plain = MediaCodec.encodeWav(44100, samples)
    // splice a LIST chunk (10 bytes payload, odd→padded) between fmt and data
    val listChunk = ByteBuffer.allocate(8 + 10).order(ByteOrder.LITTLE_ENDIAN)
    listChunk.put("LIST".getBytes("US-ASCII")).putInt(9)
      .put("INFOxxxxx".getBytes("US-ASCII")).put(0.toByte) // 9 bytes + word pad
    val spliced = plain.take(36) ++ listChunk.array() ++ plain.drop(36)
    ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8) // fix RIFF size
    val wav = MediaCodec.decodeWav(spliced)
    assert(wav.sampleRate == 44100 && wav.samples.toSeq == samples.toSeq)
  }

  test("wav: malformed inputs throw named errors") {
    val notRiff = intercept[IllegalArgumentException] {
      MediaCodec.decodeWav("definitely not audio bytes....".getBytes)
    }
    assert(notRiff.getMessage.contains("bad magic"))
    val noData = intercept[IllegalArgumentException] {
      MediaCodec.decodeWav(MediaCodec.encodeWav(8000, Array[Short](1)).take(36))
    }
    assert(noData.getMessage.contains("missing data"))
  }

  test("multimodal_decode: real decode end-to-end — deterministic, typed, content-derived") {
    val a = MultimodalOps.multimodalDecode(spark, sfDir).collect()
    val b = MultimodalOps.multimodalDecode(spark, sfDir).collect()
    assert(a.nonEmpty && a.sameElements(b))
    a.foreach { r =>
      val mt = r.getAs[String]("media_type")
      assert(r.getAs[Int]("n_bytes") > 0)
      if (mt == "image") {
        assert(r.getAs[Long]("doc_id") % 2 == 0)
        val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
        assert(w >= 4 && w <= 35 && h >= 4 && h <= 35)
        assert(r.getAs[Int]("resized_w") <= 16 && r.getAs[Int]("resized_h") <= 16)
        assert(r.getAs[Int]("n_frames") == 1)
        val luma = r.getAs[Double]("feature")
        assert(luma >= 0.0 && luma <= 255.0)
      } else {
        assert(mt == "audio" && r.getAs[Long]("doc_id") % 2 == 1)
        assert(r.getAs[Int]("sample_rate") == 8000)
        assert(r.getAs[Int]("n_frames") >= 1 && r.getAs[Int]("n_sampled") >= 1)
        val rms = r.getAs[Double]("feature")
        assert(rms > 0.0 && rms <= 1.0)
      }
    }
  }

  test("multimodal_decode kernel: renderBmp/renderWav produce parseable media whose dims derive from content") {
    val text = "the quick brown fox"
    val h = java.security.MessageDigest.getInstance("MD5").digest(text.getBytes("UTF-8"))
    val img = MediaCodec.decodeBmp(MultimodalOps.renderBmp(text))
    assert(img.width == 4 + (h(0) & 0x1f) && img.height == 4 + (h(1) & 0x1f))
    val wav = MediaCodec.decodeWav(MultimodalOps.renderWav(text))
    assert(wav.nSamples == 200 + (text.length % 800))
    // decodeOne rejects unknown media types by name
    val bad = intercept[IllegalArgumentException] {
      MultimodalOps.decodeOne(1L, "video", Array[Byte](1, 2, 3))
    }
    assert(bad.getMessage.contains("unknown media_type"))
  }
}
