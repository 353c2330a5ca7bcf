package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Extended LLM-training-data operators beyond SURVEY.md §2.B's original
  * list (north star: dedup family, similarity-search scale path, text
  * analysis, fingerprinting — graded as first-class components).
  *
  * Scale notes (100 TB):
  *  - Every dedup variant here is blocking-based (band buckets /
  *    signature prefixes), NEVER all-pairs: the only shuffle is
  *    groupBy(bucket) over one small row per (doc, band).
  *  - `dedup_ngram` / `dedup_embed` bound the candidate side to a probe
  *    set — the production pattern for incremental dedup (new batch vs
  *    corpus), where the corpus side streams and the probe side
  *    broadcasts.
  *  - `sim_ann` is the approximate scale path for `sim_topk`:
  *    sign-LSH (random hyperplanes) buckets cut the corpus per probe to
  *    colliding candidates only, then exact cosine re-ranks. Highly
  *    similar vectors share all sign bits, so true near-duplicates are
  *    found with probability ~1 (OperatorSpecs pins this).
  *  - Signature computation (simhash / sign-LSH) is a single tight-loop
  *    UDF per row: pure map-side CPU, embarrassingly parallel.
  */
object LlmOpsExt {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash over term-frequency-weighted token hashes; two 32-bit
    * murmur seeds give the 64 bits. Tight loop, one evaluation per doc. */
  private[operators] val simhashUdf = udf { text: String =>
    val acc = new Array[Int](64)
    text.split(' ').foreach { tok =>
      val h = (scala.util.hashing.MurmurHash3.stringHash(tok, 42).toLong << 32) |
        (scala.util.hashing.MurmurHash3.stringHash(tok, 7).toLong & 0xffffffffL)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Near-dup candidates by SimHash band blocking: 4 bands of 16 bits;
    * docs sharing any band are candidates, kept if hamming(sig) <= 8.
    * Injects mutated copies of the 3 lowest-id docs (like `dedup_fuzzy`)
    * so the pipeline provably rediscovers them. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val mutated = docs.orderBy(col("doc_id").asc).limit(3)
      .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" mutated")).as("text"))
    val sigs = docs.unionByName(mutated)
      .select(col("doc_id"), simhashUdf(col("text")).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b), shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL)))): _*))
        .as("bucket"))
    val buckets = banded.groupBy(col("bucket"))
      .agg(array_sort(collect_set(struct(col("doc_id"), col("sig")))).as("ids"))
      .filter(size(col("ids")) > 1)
    buckets.select(explode(
        flatten(transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(sequence(i + 1, size(col("ids")) - 1), j =>
            struct(element_at(col("ids"), i + 1).as("a"),
                   element_at(col("ids"), j + 1).as("b")))))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"),
              bit_count(col("p.a.sig").bitwiseXOR(col("p.b.sig"))).as("hamming"))
      .filter(col("hamming") <= 8)
      .distinct()
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  // ---- n-gram / token-set Jaccard --------------------------------------

  /** Exact token-set Jaccard of a bounded probe set (the 3 injected
    * mutated docs) against the corpus — the re-rank stage a banded LSH
    * prefilter feeds at scale. DuckDB-oracled. */
  def dedupNgram(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val probes = docs.orderBy(col("doc_id").asc).limit(3)
      .select((col("doc_id") + 1000000L).as("p_id"),
              array_distinct(split(concat(col("text"), lit(" mutated")), " ")).as("p_toks"))
    val corpus = docs.select(col("doc_id").as("c_id"),
                             array_distinct(split(col("text"), " ")).as("c_toks"))
    broadcast(probes).crossJoin(corpus)
      .withColumn("jaccard", graft.Det.r4(
        size(array_intersect(col("p_toks"), col("c_toks"))).cast("double") /
        size(array_union(col("p_toks"), col("c_toks")))))
      .filter(col("jaccard") >= 0.8)
      .select(col("p_id"), col("c_id"), col("jaccard"))
      .orderBy(col("p_id").asc, col("c_id").asc)
  }

  // ---- embedding-cosine near-dup ---------------------------------------

  /** Embedding near-duplicate detection: 3 injected scaled copies
    * (x -> 1.001x, cosine ~= 1) probed against the corpus; pairs with
    * cosine >= 0.999 survive. DuckDB-oracled via list_cosine_similarity. */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val dbl: Column => Column = c => transform(c, x => x.cast("double"))
    val probes = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000000L).as("p_id"),
              transform(dbl(col("embedding")), x => x * 1.001).as("p_emb"))
    val corpus = emb.select(col("vec_id").as("c_id"), dbl(col("embedding")).as("c_emb"))
    val dot = aggregate(zip_with(col("p_emb"), col("c_emb"), (x, y) => x * y),
                        lit(0.0), (a, v) => a + v)
    val np = sqrt(aggregate(col("p_emb"), lit(0.0), (a, x) => a + x * x))
    val nc = sqrt(aggregate(col("c_emb"), lit(0.0), (a, x) => a + x * x))
    broadcast(probes).crossJoin(corpus)
      .withColumn("cos", dot / (np * nc))
      .filter(col("cos") >= 0.999)
      .select(col("p_id"), col("c_id"), graft.Det.r4(col("cos")).as("cosine"))
      .orderBy(col("p_id").asc, col("c_id").asc)
  }

  // ---- approximate nearest neighbors (sign-LSH) -------------------------

  private val AnnPlanes = 16
  private val Dim = 64
  /** Fixed pseudo-random hyperplanes (LCG, seed 1234543) — deterministic
    * across executors/runs. */
  private[operators] val planes: Array[Array[Double]] = {
    var s = 1234543L
    def next(): Double = { s = s * 6364136223846793005L + 1442695040888963407L; (s >> 11).toDouble / (1L << 52).toDouble }
    Array.fill(AnnPlanes, Dim)(next() - 0.5)
  }

  private[operators] val annSigUdf = udf { emb: Seq[Float] =>
    var sig = 0
    var p = 0
    while (p < AnnPlanes) {
      var d = 0.0; var i = 0
      val pl = planes(p)
      while (i < Dim && i < emb.length) { d += pl(i) * emb(i); i += 1 }
      if (d > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** ANN top-5: sign-LSH signatures, 4 bands of 4 bits as bucket keys,
    * probe↔corpus bucket equi-join, exact cosine re-rank of colliding
    * candidates. The bucket join replaces `sim_topk`'s full cross
    * product — at 100 TB the corpus scan emits 4 small rows per vector
    * and only same-bucket pairs are scored. */
  def simAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val dbl: Column => Column = c => transform(c, x => x.cast("double"))
    def banded(df: DataFrame, idCol: String, embCol: String): DataFrame =
      df.select(col(idCol), dbl(col(embCol)).as(embCol + "_d"),
                annSigUdf(col(embCol)).as("sig"))
        .select(col(idCol), col(embCol + "_d"),
          explode(array((0 until 4).map(b =>
            concat_ws(":", lit(b), shiftright(col("sig"), b * 4).bitwiseAND(lit(15)))): _*))
            .as("bucket"))
    val probes = banded(emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("p_id"), col("embedding").as("p_emb")), "p_id", "p_emb")
    val corpus = banded(emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb")),
                        "c_id", "c_emb")
    val dot = aggregate(zip_with(col("p_emb_d"), col("c_emb_d"), (x, y) => x * y),
                        lit(0.0), (a, v) => a + v)
    val np = sqrt(aggregate(col("p_emb_d"), lit(0.0), (a, x) => a + x * x))
    val nc = sqrt(aggregate(col("c_emb_d"), lit(0.0), (a, x) => a + x * x))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cos").desc, col("c_id").asc)
    broadcast(probes).join(corpus, "bucket")
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"), col("p_emb_d"), col("c_emb_d"))
      .dropDuplicates("p_id", "c_id")
      .withColumn("cos", dot / (np * nc))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("p_id"), col("rnk"), col("c_id"), graft.Det.r4(col("cos")).as("cosine"))
      .orderBy(col("p_id").asc, col("rnk").asc)
  }

  /** IVF-style ANN top-5: the corpus is partitioned into 16 cells by
    * nearest centroid ("coarse quantizer"); probes search only their
    * nprobe=2 closest cells, exact cosine re-ranks within them. The
    * centroid set here is a deterministic stand-in (the 16 lowest-id
    * vectors — a real pipeline would k-means once and broadcast); the
    * 16-row "codebook" is collected to the driver exactly like a trained
    * model artifact and broadcast into the assignment UDF.
    *
    * 100 TB shape: cell assignment is one map-side pass (16 dot products
    * per vector); the probe↔corpus join is an equi-join on cell id over
    * 1/8 of the corpus per probe instead of a full scan. */
  def simAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val dbl: Column => Column = c => transform(c, x => x.cast("double"))
    // "codebook": tiny, driver-collected like a trained model, then broadcast
    val centroids: Array[(Int, Array[Double])] = emb.filter(col("vec_id") < 16)
      .selectExpr("cast(vec_id as int) id", "embedding")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cosTo(cent: Array[Double], v: Seq[Float]): Double = {
      var d = 0.0; var nv = 0.0; var nc = 0.0; var i = 0
      while (i < cent.length && i < v.length) {
        d += cent(i) * v(i); nv += v(i).toDouble * v(i); nc += cent(i) * cent(i); i += 1
      }
      d / math.sqrt(nv * nc)
    }
    val topCellsUdf = udf { (v: Seq[Float], n: Int) =>
      centroids.map { case (id, c) => (id, cosTo(c, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(n).map(_._1)
    }
    val corpus = emb.select(col("vec_id").as("c_id"), dbl(col("embedding")).as("c_emb_d"),
        explode(topCellsUdf(col("embedding"), lit(1))).as("cell"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("p_id"), dbl(col("embedding")).as("p_emb_d"),
        explode(topCellsUdf(col("embedding"), lit(2))).as("cell"))
    val dot = aggregate(zip_with(col("p_emb_d"), col("c_emb_d"), (x, y) => x * y),
                        lit(0.0), (a, v) => a + v)
    val np = sqrt(aggregate(col("p_emb_d"), lit(0.0), (a, x) => a + x * x))
    val nc = sqrt(aggregate(col("c_emb_d"), lit(0.0), (a, x) => a + x * x))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cos").desc, col("c_id").asc)
    broadcast(probes).join(corpus, "cell")
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"), col("p_emb_d"), col("c_emb_d"))
      .dropDuplicates("p_id", "c_id")
      .withColumn("cos", dot / (np * nc))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("p_id"), col("rnk"), col("c_id"), graft.Det.r4(col("cos")).as("cosine"))
      .orderBy(col("p_id").asc, col("rnk").asc)
  }

  // ---- text analysis ----------------------------------------------------

  private val langMarkers: Map[String, Set[String]] = Map(
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine"),
    "en" -> Set("the", "and", "of", "is", "not", "to", "in", "that"),
    "es" -> Set("el", "la", "de", "y", "es", "no", "un", "una"),
    "fr" -> Set("le", "la", "et", "est", "ne", "pas", "un", "une"))

  /** Language-ID heuristic: stopword-profile votes for de/en/es/fr, CJK
    * codepoint ratio for zh, "und" (undetermined) when nothing matches.
    * The corpus word-soup carries no language signal (its `lang` label is
    * independent of the text), so this is exercised on crafted sentences
    * in OperatorSpecs and emitted per-doc here for determinism only. */
  private[operators] val langIdUdf = udf { text: String =>
    val toks = text.toLowerCase.split("\\s+")
    val cjk = text.codePoints().toArray.count(cp => cp >= 0x4E00 && cp <= 0x9FFF)
    if (text.nonEmpty && cjk.toDouble / math.max(text.length, 1) > 0.2) "zh"
    else {
      val scores = langMarkers.view.mapValues(m => toks.count(m.contains)).toMap
      val (best, n) = scores.toSeq.sortBy { case (l, c) => (-c, l) }.head
      if (n == 0) "und" else best
    }
  }

  def textLangId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
              langIdUdf(col("text")).as("predicted_lang"))
      .orderBy(col("doc_id").asc)

  private val stopwords = Seq("a", "the", "of", "and", "to", "in")

  /** Quality scoring: length/stopword/digit/distinct ratios + composite
    * score, all in bit-deterministic arithmetic. DuckDB-oracled. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val stopRatio = size(filter(toks, t => t.isInCollection(stopwords))).cast("double") / nTok
    val digitRatio = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
      greatest(length(col("text")), lit(1))
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    t(spark, dir, "documents")
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        graft.Det.r4(stopRatio).as("stopword_ratio"),
        graft.Det.r4(digitRatio).as("digit_ratio"),
        graft.Det.r4(distinctRatio).as("distinct_ratio"),
        graft.Det.r4(least(nTok / 100, lit(1.0)) * 0.5 + distinctRatio * 0.5)
          .as("quality_score"))
      .orderBy(col("doc_id").asc)
  }

  /** Token counting with a BPE-ish regex (words / numbers / single
    * non-space symbols) next to whitespace counting. DuckDB-oracled. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
          .as("bpe_tokens"),
        length(col("text")).as("n_chars"))
      .orderBy(col("doc_id").asc)

  /** Document fingerprinting: md5 of the body plus a winnowing-style
    * minimum over 3-token shingle md5s (the rolling-window fingerprint
    * used for plagiarism/near-dup detection). DuckDB-oracled. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(spark, dir, "documents")
      .select(col("doc_id"),
        md5(col("text")).as("fp_full"),
        array_min(transform(sequence(lit(1), greatest(size(toks) - 2, lit(1))),
          i => md5(concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
                             element_at(toks, i + 2))))).as("fp_min_shingle"))
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_ngram" -> (dedupNgram _),
    "dedup_embed" -> (dedupEmbed _),
    "sim_ann" -> (simAnn _),
    "sim_ann_ivf" -> (simAnnIvf _),
    "text_lang_id" -> (textLangId _),
    "text_quality" -> (textQuality _),
    "token_count" -> (tokenCount _),
    "doc_fingerprint" -> (docFingerprint _))

  val oracle: Map[String, String] = Map(
    "dedup_ngram" ->
      """WITH probes AS (
        |  SELECT doc_id + 1000000 AS p_id,
        |         list_distinct(string_split(text || ' mutated', ' ')) AS p_toks
        |  FROM documents ORDER BY doc_id ASC LIMIT 3)
        |SELECT p_id, doc_id AS c_id,
        |  floor(CAST(len(list_intersect(p_toks, list_distinct(string_split(text, ' ')))) AS DOUBLE)
        |        / len(list_distinct(list_concat(p_toks, string_split(text, ' ')))) * 10000 + 0.5) / 10000 AS jaccard
        |FROM probes CROSS JOIN documents
        |WHERE floor(CAST(len(list_intersect(p_toks, list_distinct(string_split(text, ' ')))) AS DOUBLE)
        |        / len(list_distinct(list_concat(p_toks, string_split(text, ' ')))) * 10000 + 0.5) / 10000 >= 0.8
        |ORDER BY p_id ASC NULLS FIRST, c_id ASC NULLS FIRST""".stripMargin,
    "dedup_embed" ->
      """WITH probes AS (
        |  SELECT vec_id + 1000000 AS p_id,
        |         list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.001) AS p_emb
        |  FROM embeddings WHERE vec_id < 3)
        |SELECT p_id, vec_id AS c_id,
        |  floor(list_cosine_similarity(p_emb, CAST(embedding AS DOUBLE[])) * 10000 + 0.5) / 10000 AS cosine
        |FROM probes CROSS JOIN embeddings
        |WHERE list_cosine_similarity(p_emb, CAST(embedding AS DOUBLE[])) >= 0.999
        |ORDER BY p_id ASC NULLS FIRST, c_id ASC NULLS FIRST""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  floor(CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['a','the','of','and','to','in'], t))) AS DOUBLE)
        |        / len(string_split(text, ' ')) * 10000 + 0.5) / 10000 AS stopword_ratio,
        |  floor(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |        / greatest(length(text), 1) * 10000 + 0.5) / 10000 AS digit_ratio,
        |  floor(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')) * 10000 + 0.5) / 10000 AS distinct_ratio,
        |  floor((least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100, 1.0) * 0.5
        |         + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) * 0.5) * 10000 + 0.5) / 10000 AS quality_score
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_full,
        |  list_min(list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
        |    i -> md5(string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]))) AS fp_min_shingle
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin)
}
