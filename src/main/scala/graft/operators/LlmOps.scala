package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** LLM-training-data-pipeline operators (north star, BASELINE.json;
  * SURVEY.md §2.B "LLM-data-pipeline"): dedup, similarity search, text
  * analysis, multimodal columns — over the `documents` and `embeddings`
  * tables.
  *
  * Scale notes (100 TB):
  *  - `dedup_exact` is a hash groupBy on the text: one shuffle keyed by
  *    the (in production: a 128-bit hash of the) document body; at 100 TB
  *    you'd group on `xxhash64(text)` to shuffle 8 bytes instead of the
  *    body — the plan shape is identical.
  *  - `dedup_fuzzy` is banded MinHash LSH: shingle -> 32 minhashes ->
  *    8 bands of 4 -> groupBy(band, signature). Cost is O(n·k) map-side
  *    plus a shuffle of n·bands small rows, NEVER the O(n²) all-pairs
  *    product; only same-bucket candidates are paired (SURVEY.md:229).
  *  - `sim_topk` broadcasts the (small) query set against the corpus:
  *    corpus side streams, no shuffle; the per-query top-k is a window
  *    rank over |queries|·|corpus| scored rows. The 100 TB path keeps the
  *    same plan with an LSH/IVF prefilter shrinking the corpus per query.
  *  - `text_stats` / `multimodal_cols` are narrow projections (+ one
  *    broadcastable equi-join) — no scale hazards.
  */
object LlmOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  /** Exact dedup: canonical (minimum) doc_id + copy count per distinct text. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"), col("text"))
      .orderBy(col("doc_id").asc)

  // ---- MinHash LSH ------------------------------------------------------
  // All 32 minhashes in ONE pass over the 3-word shingles of a document,
  // emitted as the 8 banded bucket keys: a tight static JVM loop invoked
  // via Catalyst StaticInvoke (graft.functions.HashKernels.minhashBuckets)
  // -- no UDF closure, no converter round-trip, per-row CPU only; the
  // single shuffle is the band bucket. Signatures are deterministic
  // across executors and runs (fixed MurmurHash3 seed).

  /** Near-duplicate candidate pairs via banded MinHash LSH.
    *
    * The corpus word-soup has no natural near-dups, so the query unions in
    * deterministic mutated copies (doc_id+1,000,000, one appended word) of
    * the three lowest-id documents; the pipeline must rediscover each
    * (original, copy) pair through the band buckets — end-to-end proof the
    * LSH shuffle shape works, with output guaranteed non-empty. */
  def dedupFuzzy(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    // localCheckpoint the 3-row TakeOrdered subtree (r20, VERDICT r19
    // #5; guide §2.4/§3.3 — truncate a duplicated subtree): the union
    // feeds BOTH the banding pass and the token re-rank pass, so without
    // the checkpoint each derivation re-ran the full-corpus TakeOrdered
    // — 2 extra corpus text passes at scale for 3 rows. Eager, 3 rows,
    // inside the timed query.
    val mutated = docs.orderBy(col("doc_id").asc).limit(3)
      .select((col("doc_id") + 1000000L).as("doc_id"),
              concat(col("text"), lit(" mutated")).as("text"))
      .localCheckpoint()
    dedupFuzzyOn(docs.unionByName(mutated), DefaultMaxBucket)
  }

  /** Hot-bucket cap: an LSH bucket larger than this is dropped before pair
    * expansion. A degenerate bucket (boilerplate shingles shared by millions
    * of docs) would otherwise emit |bucket|² pairs into one reducer — the
    * classic LSH OOM at 100 TB. What such a bucket holds is exact-duplicate
    * or boilerplate mass, which is `dedup_exact`'s job; genuine near-dup
    * *pairs* still collide in their other, smaller buckets. */
  private[operators] val DefaultMaxBucket = 64

  /** LSH core over a prepared (doc_id, text) relation: band-bucket the
    * minhash signatures, self-join on bucket (doc_a < doc_b) — pairs STREAM
    * out of the join instead of materializing per-bucket id arrays — then
    * exact-Jaccard re-rank for precision. */
  private[operators] def dedupFuzzyOn(docsAll: DataFrame, maxBucket: Int): DataFrame = {
    // one row per (doc, band): bucket key = band index + that band's slice
    val banded = docsAll
      .select(col("doc_id"), explode(graft.functions.HashKernels.minhash_buckets(col("text"))).as("bucket"))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      .filter(col("bsz") <= maxBucket)
      .select(col("doc_id"), col("bucket"))
    // bucket self-join: the two sides are the same plan, so the bucket
    // Exchange is computed once and reused; no collect_set, no per-bucket
    // array whose size is unbounded.
    val candidates = banded.select(col("bucket"), col("doc_id").as("doc_a"))
      .join(banded.select(col("bucket"), col("doc_id").as("doc_b")), "bucket")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    // precision stage: LSH gives recall, exact token-set Jaccard on the
    // few surviving candidates gives precision (band collisions of
    // merely-similar docs are dropped). At 100 TB the candidate set is
    // tiny relative to the corpus, so these two joins shuffle almost
    // nothing (or broadcast the candidate list outright).
    val toks = docsAll
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    candidates
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")), "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")), "doc_b")
      .withColumn("jaccard", graft.Det.r4(
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
        size(array_union(col("toks_a"), col("toks_b")))))
      .filter(col("jaccard") >= 0.7)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a").asc, col("doc_b").asc)
  }

  /** Exact cosine top-5 neighbors for a 10-vector query set against the
    * whole corpus. Query side is broadcast; dot/norms are sequential
    * left-folds over double-cast elements so the oracle
    * (list_cosine_similarity over DOUBLE[]) reproduces them bit-for-bit. */
  def simTopk(spark: SparkSession, dir: String): DataFrame = {
    // optimizer Rule: rewrites the per-pair norms below the join (each
    // side's norm computed once per row, not once per pair) — see
    // graft.plans.PushVecNormThroughJoin; VecNormRuleSpec pins the rewrite
    graft.plans.PushVecNormThroughJoin.register(spark)
    val emb = t(spark, dir, "embeddings")
    val dbl: Column => Column = c => transform(c, x => x.cast("double"))
    val queriesDf = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), dbl(col("embedding")).as("q_emb"))
    val corpus = emb.select(col("vec_id").as("c_id"), dbl(col("embedding")).as("c_emb"))
    // codegen'd native loop (graft.functions.VecDot) — bit-identical to
    // the aggregate(zip_with) HOF chain but allocation-free and fused
    val dot = graft.functions.VecDot.vec_dot(col("q_emb"), col("c_emb"))
    val nq = graft.functions.VecDot.vec_norm(col("q_emb"))
    val nc = graft.functions.VecDot.vec_norm(col("c_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)
    // broadcast the QUERY side: the corpus side must stream (at 100 TB it
    // is the big one), so the build side is the handful of probe vectors
    broadcast(queriesDf).crossJoin(corpus)
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", dot / (nq * nc))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("rnk"), col("c_id"), graft.Det.r4(col("cos")).as("cosine"))
      .orderBy(col("q_id").asc, col("rnk").asc)
  }

  /** Per-document text statistics: chars, tokens, distinct tokens,
    * type-token ratio, mean token length. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("tokens", split(col("text"), " "))
      .select(
        col("doc_id"), col("lang"),
        length(col("text")).as("n_chars"),
        size(col("tokens")).as("n_tokens"),
        size(array_distinct(col("tokens"))).as("n_distinct"),
        graft.Det.r4(size(array_distinct(col("tokens"))).cast("double") / size(col("tokens")))
          .as("ttr"),
        graft.Det.r4(length(regexp_replace(col("text"), " ", "")).cast("double") / size(col("tokens")))
          .as("avg_token_len"))
      .orderBy(col("doc_id").asc)

  /** Binary + text + vector in one relation: documents ⋈ embeddings with a
    * BinaryType column derived from the text (octet length surfaces it
    * in comparable form). */
  def multimodalCols(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .join(t(spark, dir, "embeddings"), col("doc_id") === col("vec_id"))
      .withColumn("blob", col("text").cast("binary"))
      .select(
        col("doc_id"), col("lang"),
        length(col("blob")).as("n_bytes"),
        size(col("embedding")).as("dim"),
        graft.Det.r4(element_at(col("embedding"), 1).cast("double")).as("e0"))
      .orderBy(col("doc_id").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_fuzzy" -> (dedupFuzzy _),
    "sim_topk" -> (simTopk _),
    "text_stats" -> (textStats _),
    "multimodal_cols" -> (multimodalCols _))

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(1) AS n_copies, text
        |FROM documents GROUP BY text
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "sim_topk" ->
      """SELECT q_id, rnk, c_id, floor(cos * 10000 + 0.5) / 10000 AS cosine FROM (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos,
        |    CAST(row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS INTEGER) AS rnk
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id) t
        |WHERE rnk <= 5
        |ORDER BY q_id ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin,
    "text_stats" ->
      """SELECT doc_id, lang,
        |  CAST(length(text) AS INTEGER) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
        |  floor(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) * 10000 + 0.5) / 10000 AS ttr,
        |  floor(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) * 10000 + 0.5) / 10000 AS avg_token_len
        |FROM documents ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "multimodal_cols" ->
      """SELECT doc_id, lang,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  floor(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) / 10000 AS e0
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)
}
