package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DoubleType, FloatType, IntegerType, LongType, StringType}
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

  // ---- Bitmap OR (mv_distinct state merge, r15) -------------------------

  /** Byte-wise OR of two bitmaps; the shorter input is zero-extended.
    * `bitmap_construct_agg` emits fixed-width buckets so the lengths
    * normally match — the padding keeps the kernel total either way.
    * Codegen'd via StaticInvoke: the MV merge path ORs one pair per
    * (group, bucket), never per row. */
  def bitmapOr(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (lo, hi) = if (a.length <= b.length) (a, b) else (b, a)
    val out = java.util.Arrays.copyOf(hi, hi.length)
    var i = 0
    while (i < lo.length) { out(i) = (out(i) | lo(i)).toByte; i += 1 }
    out
  }

  /** Column API: byte-wise OR of two BINARY bitmap buckets. */
  def bitmap_or2(x: Column, y: Column): Column =
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, BinaryType, "bitmapOr",
      Seq(SqlBridge.expression(x), SqlBridge.expression(y)),
      returnNullable = false))

  // ---- String prefix rank (z-order string dims, r12) -------------------

  /** First 7 UTF-8 bytes of `s` packed big-endian into a NON-NEGATIVE
    * long — a monotone map from byte-wise string order onto the integral
    * grid the z-curve interleaves (TableFormat.optimizeZorderN). Strings
    * equal through 7 bytes collapse to one grid cell, which only loosens
    * clustering; the recorded per-file bounds come from the real strings,
    * so pruning correctness never depends on this rank. */
  def prefixRank(s: UTF8String): Long = {
    val b = s.getBytes
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    v
  }

  /** Column API: the 56-bit prefix rank (NULL in, NULL out). */
  def prefix_rank(c: Column): Column =
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, LongType, "prefixRank",
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
    * FLOAT embedding. The hyperplane table is `Dim`-wide; a wider
    * embedding would be silently truncated to its first `Dim` components,
    * so it is rejected instead (the ARRAY<FLOAT> element type itself is
    * enforced at analysis time via the StaticInvoke inputTypes below). */
  def annBandSigs(emb: ArrayData, bands: Int, w: Int): ArrayData = {
    val planes = planesFor(bands * w)
    val n = emb.numElements()
    require(n <= Dim,
      s"ann_band_sigs supports embeddings up to $Dim dims, got $n — widen HashKernels.Dim")
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

  /** Column API: ARRAY<BIGINT> sign-LSH band signatures. `inputTypes`
    * makes Catalyst enforce ARRAY<FLOAT> at analysis time — StaticInvoke
    * otherwise skips type checks, and `getFloat` on 8-byte elements would
    * read garbage silently. */
  def ann_band_sigs(c: Column, bands: Int, w: Int): Column =
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, ArrayType(LongType), "annBandSigs",
      Seq(SqlBridge.expression(c), Literal(bands), Literal(w)),
      inputTypes = Seq(ArrayType(FloatType), IntegerType, IntegerType),
      returnNullable = false))

  // ---- IVF coarse quantizer (sim_ann_ivf) ------------------------------

  /** Per-thread cache of the last codebook parsed from its flattened
    * plan-constant form. The same Literal ArrayData instance arrives for
    * every row a task evaluates, so an identity check gives one unflatten
    * per task thread — with no driver-populated global registry, which
    * would not exist on real executors. */
  private val lastCodebook = new ThreadLocal[(ArrayData, Array[Array[Double]])]

  private def codebookFor(flat: ArrayData, dim: Int): Array[Array[Double]] = {
    val cached = lastCodebook.get()
    if (cached != null && (cached._1 eq flat)) cached._2
    else {
      val k = flat.numElements() / dim
      val cb = Array.tabulate(k)(c => Array.tabulate(dim)(i => flat.getDouble(c * dim + i)))
      lastCodebook.set((flat, cb))
      cb
    }
  }

  /** Top-`n` IVF cells for one embedding: cosine against every centroid
    * of the codebook, ordered (score desc, cell asc). Bit-identical to
    * the interpreted UDF it replaced (same loop bounds, same tuple-sort
    * tie-break) but over `ArrayData` primitives with no converter
    * round-trip — this is the one map-side pass every corpus row pays. */
  def ivfTopCells(emb: ArrayData, flat: ArrayData, dim: Int, n: Int): ArrayData = {
    val cb = codebookFor(flat, dim)
    val ne = emb.numElements()
    val scores = new Array[Double](cb.length)
    var c = 0
    while (c < cb.length) {
      val cent = cb(c)
      var d = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      val lim = math.min(cent.length, ne)
      while (i < lim) {
        val v = emb.getFloat(i).toDouble
        d += cent(i) * v
        nv += v * v
        nc += cent(i) * cent(i)
        i += 1
      }
      scores(c) = d / math.sqrt(nv * nc)
      c += 1
    }
    val order = Array.tabulate(cb.length)(identity).sortBy(i => (-scores(i), i))
    new GenericArrayData(Array.tabulate[Any](math.min(n, cb.length))(j => order(j)))
  }

  /** Column API: ARRAY<INT> of the top-n cell ids. The trained codebook
    * travels flattened as an ARRAY<DOUBLE> literal inside the plan —
    * Spark broadcasts task binaries, so executors receive it once per
    * stage, never per row (the "train once, broadcast" model-artifact
    * path without a closure capture). */
  def ivf_top_cells(emb: Column, flatCodebook: Array[Double], dim: Int, n: Int): Column = {
    require(dim > 0 && flatCodebook.length % dim == 0,
      s"codebook length ${flatCodebook.length} is not a multiple of dim $dim")
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, ArrayType(IntegerType), "ivfTopCells",
      Seq(SqlBridge.expression(emb),
          Literal.create(flatCodebook, ArrayType(DoubleType, containsNull = false)),
          Literal(dim), Literal(n)),
      inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType, containsNull = false),
        IntegerType, IntegerType),
      returnNullable = false))
  }

  // ---- product quantization (sim_ann_pq) -------------------------------

  /** PQ ENCODE: split the embedding into `m` contiguous sub-vectors and
    * code each as its L2-NEAREST of `k` per-subspace centroids. The
    * codebooks travel flattened m × k × subDim (subspace-major). Ties
    * break to the LOWEST centroid id — bit-deterministic across runs
    * and executors. Output ARRAY<INT> of m codes: the 100 TB point is
    * the index stores m small ints (m bytes in a real byte-packed
    * layout) instead of dim floats — a 32× compression at dim=64/m=8. */
  def pqEncode(emb: ArrayData, flat: ArrayData, m: Int, k: Int): ArrayData = {
    val subDim = flat.numElements() / (m * k)
    val ne = emb.numElements()
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (mi * k + c) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val idx = mi * subDim + i
          val v = if (idx < ne) emb.getFloat(idx).toDouble else 0.0
          val diff = v - flat.getDouble(base + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** PQ DECODE: reconstruct the (lossy) vector by concatenating each
    * code's centroid — the decompression side of asymmetric distance
    * computation (the probe stays exact, the corpus is decoded). */
  def pqDecode(codes: ArrayData, flat: ArrayData, m: Int, k: Int): ArrayData = {
    val subDim = flat.numElements() / (m * k)
    val out = new Array[Any](m * subDim)
    var mi = 0
    while (mi < m) {
      val base = (mi * k + codes.getInt(mi)) * subDim
      var i = 0
      while (i < subDim) {
        out(mi * subDim + i) = flat.getDouble(base + i)
        i += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  def pq_encode(emb: Column, flatCodebooks: Array[Double], m: Int, k: Int): Column = {
    require(m > 0 && k > 0 && flatCodebooks.length % (m * k) == 0,
      s"PQ codebooks length ${flatCodebooks.length} is not m*k*subDim for m=$m k=$k")
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, ArrayType(IntegerType), "pqEncode",
      Seq(SqlBridge.expression(emb),
          Literal.create(flatCodebooks, ArrayType(DoubleType, containsNull = false)),
          Literal(m), Literal(k)),
      inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType, containsNull = false),
        IntegerType, IntegerType),
      returnNullable = false))
  }

  def pq_decode(codes: Column, flatCodebooks: Array[Double], m: Int, k: Int): Column = {
    require(m > 0 && k > 0 && flatCodebooks.length % (m * k) == 0,
      s"PQ codebooks length ${flatCodebooks.length} is not m*k*subDim for m=$m k=$k")
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, ArrayType(DoubleType), "pqDecode",
      Seq(SqlBridge.expression(codes),
          Literal.create(flatCodebooks, ArrayType(DoubleType, containsNull = false)),
          Literal(m), Literal(k)),
      inputTypes = Seq(ArrayType(IntegerType), ArrayType(DoubleType, containsNull = false),
        IntegerType, IntegerType),
      returnNullable = false))
  }

  // ---- n-gram md5 keys (decontam_overlap) ------------------------------

  private val hexDigits = "0123456789abcdef".toCharArray

  /** All n-token-gram md5 hex keys of a whitespace-tokenized text in ONE
    * pass — replaces `transform(sequence(...), i -> md5(concat_ws(' ',
    * slice(split(text), i, n))))`, whose lambda evaluates interpreted per
    * gram position (HOFs don't codegen) and re-slices the token array
    * each time. Bit-identical output: same `split(' ', -1)` tokenization,
    * same single-space join, same lowercase-hex md5 (CorpusOpsSpec pins
    * equality against the HOF chain). Returns an empty array for texts
    * shorter than n tokens. */
  def gramMd5Keys(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = hexDigits((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexDigits(d(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Strided variant of [[gramMd5Keys]]: NON-overlapping `size`-token
    * chunks (stride = size, complete chunks only) — the paragraph/window
    * unit of chunk-level dedup. Same one-pass digest loop; a doc yields
    * ⌊n/size⌋ keys instead of n−size+1. */
  def chunkMd5Keys(text: UTF8String, size: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = toks.length / size
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < size) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i * size + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(b * 2) = hexDigits((d(b) >> 4) & 0xf)
        hex(b * 2 + 1) = hexDigits(d(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: ARRAY<STRING> of md5 keys of non-overlapping chunks. */
  def chunk_md5_keys(c: Column, size: Int): Column = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, ArrayType(StringType), "chunkMd5Keys",
      Seq(SqlBridge.expression(c), Literal(size)),
      inputTypes = Seq(StringType, IntegerType),
      returnNullable = false))
  }

  /** Column API: ARRAY<STRING> of the text's n-gram md5 keys. */
  def gram_md5_keys(c: Column, n: Int): Column = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, ArrayType(StringType), "gramMd5Keys",
      Seq(SqlBridge.expression(c), Literal(n)),
      inputTypes = Seq(StringType, IntegerType),
      returnNullable = false))
  }

  // ---- Bloom-filter gate (join_bloom_prefilter) ------------------------

  private val lastSketch =
    new ThreadLocal[(AnyRef, org.apache.spark.util.sketch.BloomFilter)]

  /** Membership probe against a BloomFilter shipped serialized as a
    * BinaryType plan constant: deserialized once per task thread
    * (identity-cached), then a straight `mightContainLong` per row — no
    * ScalaUDF closure, so the fact-table scan stays inside whole-stage
    * codegen. */
  def bloomMightContain(key: Long, sketch: Array[Byte]): Boolean = {
    val cached = lastSketch.get()
    val bf =
      if (cached != null && (cached._1 eq sketch)) cached._2
      else {
        val parsed = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(sketch))
        lastSketch.set((sketch, parsed))
        parsed
      }
    bf.mightContainLong(key)
  }

  /** Column API: BOOLEAN gate over a BIGINT key. */
  def bloom_might_contain(key: Column, bf: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    SqlBridge.column(StaticInvoke(
      HashKernels.getClass, BooleanType, "bloomMightContain",
      Seq(SqlBridge.expression(key), Literal.create(bos.toByteArray, BinaryType)),
      inputTypes = Seq(LongType, BinaryType),
      returnNullable = false))
  }
}
