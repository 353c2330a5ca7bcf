package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels for the dedup/ANN blocking stages, wired into
  * plans with Catalyst `StaticInvoke` (the same mechanism Spark's own
  * datetime/decimal helpers use): the generated code calls these methods
  * directly on internal types (`UTF8String` in, `ArrayData` out) — no
  * Scala-UDF closure indirection and no CatalystTypeConverters round-trip
  * for the input column or the output array. The per-row cost at 100 TB
  * is exactly these loops.
  *
  * The hash math is IDENTICAL to the round-2 Scala UDFs it replaces
  * (MurmurHash3.stringHash on the token string, same seeds/permutations),
  * so every bucket key, signature, and downstream dedup result is
  * unchanged — LlmOpsSpec/LlmExtSpecs pin that.
  */
object HashKernels {
  // ---- MinHash (dedup_fuzzy) -------------------------------------------
  val NumHashes = 32
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands
  val MersennePrime = 2147483647L // 2^31 - 1
  // deterministic "random" permutation parameters (odd a, arbitrary b)
  private val permA: Array[Long] =
    Array.tabulate(NumHashes)(i => 2L * i + 1 + 2654435761L % MersennePrime)
  private val permB: Array[Long] =
    Array.tabulate(NumHashes)(i => (i * 40503L + 2246822519L) % MersennePrime)

  /** 3-token shingles → 32 minhashes → 8 banded LSH bucket keys
    * ("band:sig:sig:sig:sig"). Emits the bucket keys directly so the
    * signature is computed exactly once per row (a separate sig column
    * would be re-evaluated per band expression by CollapseProject). */
  def minhashBuckets(text: UTF8String): ArrayData = {
    val tokens = text.toString.split(' ')
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val nShingles = math.max(tokens.length - 2, 1)
    var i = 0
    while (i < nShingles) {
      val s =
        if (tokens.length >= 3) tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2)
        else text.toString
      val h = scala.util.hashing.MurmurHash3.stringHash(s, 42)
      val hp = java.lang.Math.floorMod(h.toLong, MersennePrime)
      var j = 0
      while (j < NumHashes) {
        val v = (permA(j) * hp + permB(j)) % MersennePrime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(Array.tabulate[Any](Bands) { b =>
      val sb = new StringBuilder
      sb.append(b)
      var r = 0
      while (r < RowsPerBand) { sb.append(':').append(mins(b * RowsPerBand + r)); r += 1 }
      UTF8String.fromString(sb.toString)
    })
  }

  /** Column API: ARRAY<STRING> of the 8 LSH bucket keys. */
  def minhash_buckets(c: Column): Column =
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, ArrayType(StringType), "minhashBuckets",
      Seq(SqlBridge.expression(c)), returnNullable = false))

  // ---- SimHash (dedup_simhash) -----------------------------------------

  /** TF-weighted SimHash over whitespace tokens, emitted as `bands`
    * signatures of `bandBits` bits each. */
  def simhashBands(text: UTF8String, bands: Int, bandBits: Int): ArrayData = {
    val nBits = bands * bandBits
    val acc = new Array[Int](nBits)
    text.toString.split(' ').foreach { tok =>
      var blk = 0
      while (blk * 64 < nBits) {
        val h = (scala.util.hashing.MurmurHash3.stringHash(tok, 42 + blk * 1000).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(tok, 7 + blk * 1000).toLong & 0xffffffffL)
        val lim = math.min(64, nBits - blk * 64)
        var b = 0
        while (b < lim) {
          if (((h >>> b) & 1L) == 1L) acc(blk * 64 + b) += 1 else acc(blk * 64 + b) -= 1
          b += 1
        }
        blk += 1
      }
    }
    new GenericArrayData(Array.tabulate(bands) { bd =>
      var sig = 0L
      var j = 0
      while (j < bandBits) { if (acc(bd * bandBits + j) > 0) sig |= (1L << j); j += 1 }
      sig
    })
  }

  /** Column API: ARRAY<BIGINT> band signatures. */
  def simhash_bands(c: Column, bands: Int, bandBits: Int): Column = {
    require(bands >= 1 && bandBits >= 1 && bandBits <= 62, s"bad simhash shape $bands x $bandBits")
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, ArrayType(LongType), "simhashBands",
      Seq(SqlBridge.expression(c), Literal(bands), Literal(bandBits)),
      returnNullable = false))
  }

  // ---- sign-LSH band signatures (sim_ann) ------------------------------
  private val Dim = 64
  private val planeCache = new ConcurrentHashMap[Integer, Array[Array[Double]]]()

  /** Deterministic pseudo-random hyperplanes (LCG), cached per count —
    * identical to every executor because the seed is fixed. */
  private def planesFor(count: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(count, _ => {
      var s = 1234543L
      def next(): Double = {
        s = s * 6364136223846793005L + 1442695040888963407L
        (s >> 11).toDouble / (1L << 52).toDouble
      }
      Array.fill(count, Dim)(next() - 0.5)
    })

  /** Sign-LSH: `bands` signatures of `w` hyperplane-sign bits over a
    * FLOAT embedding. */
  def annBandSigs(emb: ArrayData, bands: Int, w: Int): ArrayData = {
    val planes = planesFor(bands * w)
    val n = emb.numElements()
    new GenericArrayData(Array.tabulate(bands) { b =>
      var sig = 0L
      var j = 0
      while (j < w) {
        val pl = planes(b * w + j)
        var d = 0.0
        var i = 0
        while (i < Dim && i < n) { d += pl(i) * emb.getFloat(i); i += 1 }
        if (d > 0) sig |= (1L << j)
        j += 1
      }
      sig
    })
  }

  /** Column API: ARRAY<BIGINT> sign-LSH band signatures. */
  def ann_band_sigs(c: Column, bands: Int, w: Int): Column =
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, ArrayType(LongType), "annBandSigs",
      Seq(SqlBridge.expression(c), Literal(bands), Literal(w)),
      returnNullable = false))
}
