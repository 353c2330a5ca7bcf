package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Training-data curation pass (r5, beyond-reference surface): the four
  * corpus-shaping operations that run between cleaning (`text_*`,
  * `dedup_*`) and the training job itself — repetition filtering,
  * sequence packing, lexical retrieval scoring, and mixture statistics.
  *
  * Scale notes (100 TB):
  *  - `text_repetition`: two aggregations keyed on doc_id (the bigram
  *    pass reuses the same shuffle key, so AQE/exchange-reuse applies);
  *    the keep/drop verdict is pure integer arithmetic — no float
  *    thresholds to drift across engines. Shuffles carry (doc_id, term)
  *    pairs, never document bodies.
  *  - `seq_pack`: packing is per-source (the real pipeline packs within a
  *    shard) — one shuffle on source, one per-partition sort by doc_id,
  *    and a cumulative-sum window that streams each partition once. A
  *    global `Window.orderBy` with no partition key would collapse to one
  *    task at 100 TB; the per-shard form is embarrassingly parallel.
  *  - `text_bm25`: same two map-side-combined aggs as `text_tfidf` plus a
  *    three-row broadcast of the query-term df table; corpus-wide scalars
  *    (N, Σdl) travel as one broadcast row. The per-(doc,term) score is a
  *    single codegen'd double expression.
  *  - `mix_domain_stats`: one map-side-combined agg over (source, lang) —
  *    the group-key cardinality is the product of two small vocabularies,
  *    so the shuffle moves O(|sources|·|langs|) rows regardless of corpus
  *    size.
  *  - `sample_split` / `mix_sample`: both gates are content-keyed md5
  *    predicates — codegen'd string compares on the scan, reproducible
  *    across reshards/engines/reruns with no RNG state; `mix_sample`'s
  *    per-source thresholds are a |sources|-row broadcast.
  */
object CurationOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  private def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")

  /** Gopher-style repetition filter: per document, the distinct-token
    * ratio and the share of tokens covered by the most frequent bigram,
    * plus an integer-exact keep verdict (`4·uniq > n` AND
    * `10·top_bigram < n`) — thresholds computed in BIGINT so the
    * keep/drop decision cannot drift by a float ulp between engines.
    * Bigrams come from a `lead` window over (doc_id, pos) — codegen'd,
    * no interpreted HOF lambda re-slicing the token array. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir).select(
      col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    val perDoc = tok.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("term")).as("n_uniq"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val topBi = tok
      .withColumn("nxt", lead(col("term"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("doc_id"), col("term"), col("nxt")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bi_n"))
    perDoc.join(topBi, Seq("doc_id"), "left")
      .withColumn("top_bi_n", coalesce(col("top_bi_n"), lit(0L)))
      .select(
        col("doc_id"), col("n_tok"), col("n_uniq"),
        Det.r4(col("n_uniq").cast("double") / col("n_tok").cast("double")).as("uniq_frac"),
        col("top_bi_n"),
        (col("n_uniq") * 4 > col("n_tok") && col("top_bi_n") * 10 < col("n_tok")).as("keep"))
      .orderBy(col("doc_id").asc)
  }

  /** Sequence packing ("concat and chunk"): within each source shard,
    * documents are laid end-to-end in doc_id order and cut into 2048-token
    * context windows; a document belongs to the window its first token
    * lands in. The cumulative offset is an exact BIGINT running sum, so
    * bin boundaries are deterministic. Output: per (source, bin) the doc
    * count, token fill, and first doc — the packing manifest a training
    * job shards on. */
  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(
      col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", expr("off div 2048"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok_sum"),
           min(col("doc_id")).as("first_doc"))
      .orderBy(col("source").asc, col("bin").asc)
  }

  /** RAG-style document CHUNKING (r12): fixed 32-token windows with a
    * 24-token stride (8-token overlap so a fact straddling a boundary
    * survives in at least one chunk) — the ingestion step every
    * retrieval pipeline runs between cleaning and embedding. Chunk
    * identity is CONTENT-derived (md5 of the chunk text), so re-chunking
    * a re-sharded / re-ordered corpus reproduces the same ids — the same
    * no-RNG reproducibility rule as the sampling family. The chunk
    * explosion happens map-side off one HOF over the token array
    * (⌈n/24⌉ chunks per doc, bounded by the doc's own length); nothing
    * shuffles but the emitted chunk rows themselves. Tail rule: windows
    * start at strides 0,24,48,… while a FULL preceding window exists;
    * the final partial window (if any tokens remain) is kept — every
    * token lands in ≥1 chunk. */
  def textChunk(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val n = size(toks)
    // number of stride starts: 1 + ceil(max(n-32,0)/24) (last start covers the tail)
    val nChunks = lit(1) + ceil(greatest(n - 32, lit(0)).cast("double") / 24).cast("int")
    docs(spark, dir)
      .select(col("doc_id"), toks.as("t"), n.as("n_tok"), nChunks.as("nc"))
      .select(col("doc_id"), col("n_tok"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => concat_ws(" ", slice(col("t"), i * 24 + 1, lit(32)))))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * 24).as("start_tok"),
        size(split(col("chunk_text"), " ")).as("n_tok"),
        md5(col("chunk_text")).as("chunk_md5"))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
  }

  /** BM25 (k1=1.2, b=0.75) retrieval scores for a fixed query-term set,
    * top-5 documents per term. The idf factor is the same integer-exact
    * `(1000·N) div df` as `text_tfidf` (libm `ln` is not correctly rounded,
    * so a float idf can flip a rank between engines); tf/length
    * normalization is a single pure-IEEE double expression — both engines
    * evaluate the identical tree, so the ranking is bit-deterministic. */
  def textBm25(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val dl = d.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
    val stats = d.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("sum_dl"))
    val tf = tok.filter(col("term").isin("data", "query", "spark"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("denom",
        col("tf").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl")))
      .withColumn("score", Det.r4(
        (expr("(1000 * n_docs) div df").cast("double") *
          (col("tf").cast("double") * lit(2.2))) / col("denom")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("term"), col("rnk"), col("doc_id"), col("score"))
      .orderBy(col("term").asc, col("rnk").asc)
  }

  /** Training-mixture composition: per (source, lang) cell, document and
    * token counts, the cell's token share, and a temperature-adjusted
    * sampling weight `sqrt(share)` (T=0.5 up-weighting of small domains —
    * IEEE requires sqrt to be correctly rounded, so unlike pow/ln it is
    * portable). Totals are exact BIGINT sums; each share is one double
    * division. */
  def mixDomainStats(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(
      col("source"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val g = d.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tok_sum"))
    val tot = d.agg(sum(col("n_tok")).as("total"))
    g.crossJoin(broadcast(tot))
      .withColumn("tok_share",
        Det.r4(col("n_tok_sum").cast("double") / col("total").cast("double")))
      .withColumn("w_sqrt",
        Det.r4(sqrt(col("n_tok_sum").cast("double") / col("total").cast("double"))))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tok_sum"),
              col("tok_share"), col("w_sqrt"))
      .orderBy(col("source").asc, col("lang").asc)
  }

  /** Deterministic train/val/test split (r5): split id comes from the
    * first hex digit of md5(text) — content-keyed like `sample_hash`, so
    * the assignment survives reshards, re-ingestion, and engine swaps
    * (a `rand()` split reproduces on NOTHING; a row-number split changes
    * whenever file order does). Digits 0-b → train (75%), c-d → val
    * (12.5%), e-f → test (12.5%). Exact-duplicate texts land in the same
    * split by construction — no train/test leakage through dup pairs.
    * One map-side-combined agg; |splits| = 3 rows shuffle at any scale. */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = substring(md5(col("text")), 1, 1)
    docs(spark, dir)
      .withColumn("split",
        when(d.isin("c", "d"), lit("val"))
          .when(d.isin("e", "f"), lit("test"))
          .otherwise(lit("train")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
           min(col("doc_id")).as("first_doc"))
      .orderBy(col("split").asc)
  }

  /** Mixture sampling (r5): the step AFTER `mix_domain_stats` — turn the
    * T=0.5 temperature weights (p_source = √token-share) into an actual
    * REPRODUCIBLE sampled corpus: a doc survives iff its md5 8-hex prefix
    * is below the source's threshold `%08x(⌊p·2³²⌋)`. Content-keyed like
    * `sample_hash`, so the mixed corpus is identical across reshards,
    * engines, and reruns — no RNG state to version. The threshold table
    * is |sources| rows (broadcast); the gate is one codegen'd string
    * compare on the scan. Fixed-width lowercase hex compares exactly like
    * the 32-bit integer it encodes, in both engines. */
  def mixSample(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      substring(md5(col("text")), 1, 8).as("h8"))
    val bySrc = d.groupBy(col("source")).agg(sum(col("n_tok")).as("src_tok"))
    val tot = d.agg(sum(col("n_tok")).as("total"))
    val thr = bySrc.crossJoin(broadcast(tot))
      .withColumn("p", sqrt(col("src_tok").cast("double") / col("total").cast("double")))
      .withColumn("thr_hex", format_string("%08x",
        least(floor(col("p") * 4294967296.0).cast("long"), lit(4294967295L))))
      .select(col("source"), col("thr_hex"))
    d.join(broadcast(thr), "source")
      .filter(col("h8") < col("thr_hex"))
      .groupBy(col("source"), col("thr_hex"))
      .agg(count(lit(1)).as("n_kept"),
           sum(col("n_tok")).as("tok_kept"),
           min(col("doc_id")).as("first_doc"))
      .orderBy(col("source").asc)
  }

  /** Deterministic corpus shuffle (r7): every epoch-shuffling trainer
    * needs a REPRODUCIBLE global order + shard assignment that no engine,
    * partition count, or re-run changes. Keyed shuffle: h = md5(seed ∥
    * doc_id); shard = first hex nibble (16-way), position = rank of h
    * within the shard. Content never moves twice: the only shuffle is the
    * 16-way hash exchange the rank window needs, and at 100 TB each shard
    * sorts independently (the global order is the concatenation). */
  def seqShuffle(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("seed42-"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("h").asc, col("doc_id").asc)
    Tables.t(spark, dir, "documents")
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", substring(col("h"), 1, 1))
      .select(col("doc_id"), col("shard"), row_number().over(w).as("pos"))
      .orderBy(col("shard").asc, col("pos").asc)
  }

  /** Temperature-resampled domain mix (r7): up-weight small domains with
    * p_i ∝ n_i^(1/2) (temperature 2 sampling, the multilingual-corpus
    * standard). α = 0.5 is chosen deliberately: sqrt is IEEE
    * correctly-rounded (pow(x, 0.7) is not, and differs across libm
    * builds), and the weights are floor-scaled to BIGINT before the
    * normalizing sum so the total is integer-exact — no float summation
    * order anywhere. One |domains|-row aggregate + a 1-row broadcast. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.t(spark, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .select(col("source"), col("n"),
        floor(sqrt(col("n").cast("double")) * 10000 + 0.5).cast("long").as("w"))
    val tot = d.agg(sum(col("w")).as("tw"), sum(col("n")).as("tn"))
    d.crossJoin(broadcast(tot))
      .select(col("source"), col("n"),
        Det.r4(col("n").cast("double") / col("tn").cast("double")).as("p_natural"),
        Det.r4(col("w").cast("double") / col("tw").cast("double")).as("p_temp"))
      .orderBy(col("source").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "seq_shuffle" -> (seqShuffle _),
    "mix_temperature" -> (mixTemperature _),
    "mix_sample" -> (mixSample _),
    "text_repetition" -> (textRepetition _),
    "seq_pack" -> (seqPack _),
    "text_chunk" -> (textChunk _),
    "text_bm25" -> (textBm25 _),
    "sample_split" -> (sampleSplit _),
    "mix_domain_stats" -> (mixDomainStats _))

  val oracle: Map[String, String] = Map(
    "seq_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, md5('seed42-' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents)
        |SELECT doc_id, substring(h, 1, 1) AS shard,
        |  CAST(row_number() OVER (PARTITION BY substring(h, 1, 1)
        |    ORDER BY h ASC, doc_id ASC) AS INT) AS pos
        |FROM h
        |ORDER BY shard ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin,
    "mix_temperature" ->
      """WITH d AS (
        |  SELECT source, count(1) AS n,
        |    CAST(floor(sqrt(CAST(count(1) AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw, CAST(sum(n) AS BIGINT) AS tn FROM d)
        |SELECT source, n,
        |  floor((CAST(n AS DOUBLE) / CAST(tn AS DOUBLE)) * 10000 + 0.5) / 10000 AS p_natural,
        |  floor((CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)) * 10000 + 0.5) / 10000 AS p_temp
        |FROM d, t ORDER BY source ASC NULLS FIRST""".stripMargin,
    "mix_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
        |    substring(md5(text), 1, 8) AS h8
        |  FROM documents),
        |s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok FROM d GROUP BY source),
        |tot AS (SELECT sum(n_tok) AS total FROM d),
        |thr AS (
        |  SELECT source,
        |    printf('%08x', least(CAST(floor(
        |      sqrt(CAST(src_tok AS DOUBLE) / CAST(total AS DOUBLE)) * 4294967296) AS BIGINT),
        |      4294967295)) AS thr_hex
        |  FROM s CROSS JOIN tot)
        |SELECT d.source, thr_hex, count(1) AS n_kept,
        |  CAST(sum(n_tok) AS BIGINT) AS tok_kept, min(doc_id) AS first_doc
        |FROM d JOIN thr ON d.source = thr.source
        |WHERE h8 < thr_hex
        |GROUP BY d.source, thr_hex
        |ORDER BY d.source ASC NULLS FIRST""".stripMargin,
    "sample_split" ->
      """SELECT
        |  CASE WHEN substring(md5(text), 1, 1) IN ('c', 'd') THEN 'val'
        |       WHEN substring(md5(text), 1, 1) IN ('e', 'f') THEN 'test'
        |       ELSE 'train' END AS split,
        |  count(1) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc
        |FROM documents
        |GROUP BY split
        |ORDER BY split ASC NULLS FIRST""".stripMargin,
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tok AS (
        |  SELECT doc_id, g.i AS pos, t[g.i] AS term
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g),
        |per_doc AS (
        |  SELECT doc_id, count(1) AS n_tok, count(DISTINCT term) AS n_uniq
        |  FROM tok GROUP BY doc_id),
        |bi AS (
        |  SELECT doc_id, term, nxt, count(1) AS c FROM (
        |    SELECT doc_id, term,
        |      lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        |    FROM tok) x
        |  WHERE nxt IS NOT NULL GROUP BY doc_id, term, nxt),
        |top AS (SELECT doc_id, max(c) AS top_bi_n FROM bi GROUP BY doc_id)
        |SELECT p.doc_id, n_tok, n_uniq,
        |  floor(CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) * 10000 + 0.5) / 10000 AS uniq_frac,
        |  coalesce(top_bi_n, 0) AS top_bi_n,
        |  (n_uniq * 4 > n_tok AND coalesce(top_bi_n, 0) * 10 < n_tok) AS keep
        |FROM per_doc p LEFT JOIN top USING (doc_id)
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "text_chunk" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t,
        |    len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tok,
        |    CAST(1 + ceil(CAST(greatest(n_tok - 32, 0) AS DOUBLE) / 24) AS INT) AS nc
        |  FROM d),
        |chunks AS (
        |  SELECT d.doc_id, g.i AS chunk_idx,
        |    list_aggregate(d.t[g.i * 24 + 1 : g.i * 24 + 32], 'string_agg', ' ') AS chunk_text
        |  FROM d JOIN c ON d.doc_id = c.doc_id,
        |    LATERAL (SELECT unnest(generate_series(0, c.nc - 1)) AS i) g)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(chunk_idx * 24 AS INT) AS start_tok,
        |  CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_tok,
        |  md5(chunk_text) AS chunk_md5
        |FROM chunks
        |ORDER BY doc_id ASC NULLS FIRST, chunk_idx ASC NULLS FIRST""".stripMargin,
    "seq_pack" ->
      """WITH d AS (
        |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |b AS (
        |  SELECT source, doc_id, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
        |      AS BIGINT) AS bin
        |  FROM d)
        |SELECT source, bin, count(1) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tok_sum,
        |  min(doc_id) AS first_doc
        |FROM b GROUP BY source, bin
        |ORDER BY source ASC NULLS FIRST, bin ASC NULLS FIRST""".stripMargin,
    "text_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |st AS (SELECT count(1) AS n_docs,
        |              sum(len(string_split(text, ' '))) AS sum_dl FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(1) AS tf FROM tok
        |  WHERE term IN ('data', 'query', 'spark') GROUP BY doc_id, term),
        |df AS (SELECT term, count(1) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    floor((CAST((1000 * n_docs) // df AS DOUBLE) * (CAST(tf.tf AS DOUBLE) * 2.2))
        |      / (CAST(tf.tf AS DOUBLE)
        |         + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
        |                         / (CAST(sum_dl AS DOUBLE) / n_docs)))
        |      * 10000 + 0.5) / 10000 AS score
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st)
        |SELECT term, rnk, doc_id, score FROM (
        |  SELECT term, doc_id, score,
        |    CAST(row_number() OVER (PARTITION BY term
        |      ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rnk
        |  FROM sc) t
        |WHERE rnk <= 5
        |ORDER BY term ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin,
    "mix_domain_stats" ->
      """WITH d AS (
        |  SELECT source, lang, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |g AS (
        |  SELECT source, lang, count(1) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tok_sum
        |  FROM d GROUP BY source, lang),
        |tot AS (SELECT sum(n_tok) AS total FROM d)
        |SELECT source, lang, n_docs, n_tok_sum,
        |  floor(CAST(n_tok_sum AS DOUBLE) / CAST(total AS DOUBLE) * 10000 + 0.5) / 10000 AS tok_share,
        |  floor(sqrt(CAST(n_tok_sum AS DOUBLE) / CAST(total AS DOUBLE)) * 10000 + 0.5) / 10000 AS w_sqrt
        |FROM g CROSS JOIN tot
        |ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST""".stripMargin)
}
