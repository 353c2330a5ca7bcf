package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.MediaCodec

/** Property: the BMP/WAV codecs roundtrip ARBITRARY content exactly —
  * encode → decode recovers every pixel/sample bit-for-bit at any
  * dimension (including the row-padding edge cases: widths where
  * width*3 mod 4 ∈ {0,1,2,3}) and any sample count (odd data-chunk
  * alignment included). */
object MediaCodecPropertySpec extends Properties("MediaCodec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private val genDim = Gen.chooseNum(1, 37)
  private val genPix = Gen.chooseNum(0, 0xffffff)

  property("bmp encode/decode roundtrips every pixel at every padding class") =
    forAll(genDim, genDim, Gen.long) { (w, h, seed) =>
      // deterministic pseudo-random pixels from the seed (pure function)
      def pix(x: Int, y: Int): Int = {
        val z = seed * 6364136223846793005L + (y.toLong * w + x) * 1442695040888963407L
        ((z >>> 40) & 0xffffff).toInt
      }
      val img = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, pix))
      img.width == w && img.height == h &&
        (0 until h).forall(y => (0 until w).forall(x => img.pixels(y * w + x) == pix(x, y)))
    }

  property("wav encode/decode roundtrips every sample at any length/rate") =
    forAll(Gen.chooseNum(0, 300), Gen.chooseNum(1, 192000), Gen.long) {
      (n, rate, seed) =>
        val samples = Array.tabulate[Short](n)(i =>
          ((seed + i * 2654435761L) >>> 16).toShort)
        val wav = MediaCodec.decodeWav(MediaCodec.encodeWav(rate, samples))
        wav.sampleRate == rate && wav.channels == 1 &&
          wav.samples.toSeq == samples.toSeq
    }

  property("boxResize preserves dimensions invariants and luma range") =
    forAll(genDim, genDim, Gen.long, Gen.chooseNum(1, 16)) { (w, h, seed, maxDim) =>
      def pix(x: Int, y: Int): Int =
        (((seed + x * 31 + y * 131) >>> 8) & 0xffffff).toInt
      val r = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, pix)).boxResize(maxDim)
      r.width >= 1 && r.height >= 1 &&
        math.max(r.width, r.height) <= math.max(maxDim, math.min(w, math.min(h, maxDim))) &&
        r.width <= w && r.height <= h &&
        r.meanLuma >= 0.0 && r.meanLuma <= 255.0
    }
}
