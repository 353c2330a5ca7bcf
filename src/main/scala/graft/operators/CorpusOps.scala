package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-level analytics for the LLM-pipeline surface (r5): term
  * weighting, sketch-based heavy hitters, and the k-NN neighborhood graph
  * — the three corpus statistics a training-data curation pass computes
  * after the per-document ones (`text_*`) and before sampling.
  *
  * Scale notes (100 TB):
  *  - `text_tfidf`: two map-side-combined aggs (per-(doc,term) tf and
  *    per-term df) + one broadcastable join of the |vocab|-sized df table
  *    back onto tf — the shuffles carry |doc×term| and |vocab| rows, never
  *    raw text. The rank window partitions by doc_id (same key as tf's
  *    shuffle, so AQE reuses the partitioning).
  *  - `agg_heavy_hitters`: the full-vocabulary groupBy dies when the
  *    vocabulary doesn't fit (URLs, n-grams, user ids at 100 TB). The
  *    Misra–Gries sketch (functions/MisraGries.scala) keeps O(k) state per
  *    task and moves ONE k-entry sketch per partition through the shuffle;
  *    the exact recount pass touches only the ≤ k candidate terms
  *    (broadcast semi-join gates the scan pre-shuffle).
  *  - `sim_knn_graph`: node set is a deterministic hash-gated sample;
  *    corpus side STREAMS against the broadcast node set (the same
  *    build-side choice as `sim_topk` — never broadcast the corpus). The
  *    100 TB path swaps the cross join for the `sim_ann` bucket join;
  *    plan topology is otherwise identical.
  *  - `decontam_overlap` / `dedup_paragraph`: n-gram and chunk keys
  *    travel as md5 hex via one-pass StaticInvoke kernels — shuffles
  *    carry 32-byte keys, never document text; the chunk variant emits
  *    ⌊n/16⌋ keys per doc (stride = size).
  *  - `graph_pagerank`: the graph is |types|² edges regardless of corpus
  *    size; the heavy lift (lead window + edge count) is one user-keyed
  *    shuffle, each fixed iteration shuffles |edges| grid-snapped
  *    contribution rows.
  */
object CorpusOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  private def tokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))

  /** Top-3 TF-IDF terms per document. The idf factor is the integer-exact
    * `(1000·N) div df` (integer division — both engines compute the same
    * BIGINT) rather than a float `ln(N/df)`: libm `log` is not required
    * to be correctly rounded, so two engines can disagree by 1 ulp and
    * flip a rank; the scaled-integer weight keeps the whole score in
    * exact BIGINT arithmetic and the ranking deterministic. Monotone in
    * tf and 1/df like the classic weight — same ordering semantics. */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val tok = tokens(spark, dir)
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = t(spark, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * expr("(1000 * n_docs) div df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("score"))
      .orderBy(col("doc_id").asc, col("rnk").asc)
  }

  /** Heavy hitters over the token stream: Misra–Gries(k=30) candidate
    * generation + exact recount of ONLY the candidates + the
    * `count·30 > total` threshold. The sketch guarantees every term with
    * frequency > n/31 is a candidate, and the recount makes the final set
    * exactly {term : freq·30 > n} — deterministic, so the plain
    * GROUP BY … HAVING is the oracle. */
  def aggHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val tok = tokens(spark, dir).select(col("term"))
    val cands = tok
      .agg(graft.functions.MisraGriesAgg.misra_gries(col("term"), 30).as("cands"))
      .select(explode(col("cands")).as("term"))
    val total = tok.agg(count(lit(1)).as("total"))
    tok.join(broadcast(cands), "term")
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * 30 > col("total"))
      .select(col("term"), col("n"))
      .orderBy(col("term").asc)
  }

  /** Train/test contamination detection (r5): the decontamination pass
    * every eval-set owner runs before training — which held-out (odd
    * doc_id) documents share an 8-gram with the training half (even
    * doc_id), and how much. Grams travel as 16-byte md5 keys, so the
    * distinct + join shuffles carry hashes, never text; at 100 TB the
    * (small) eval side's gram set broadcasts or feeds a bloom prefilter
    * and the training corpus streams — same topology, one pass. Output:
    * per contaminated eval doc, its distinct-gram count, hit count, and
    * contamination share. */
  def decontamOverlap(spark: SparkSession, dir: String): DataFrame = {
    // one-pass StaticInvoke kernel (HashKernels.gramMd5Keys) — the HOF
    // form (transform(sequence(..), i -> md5(concat_ws(slice(..)))))
    // evaluates its lambda interpreted per gram position and re-slices
    // the token array each time; CorpusOpsSpec pins bitwise equality
    val grams = t(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 8)
      .select(col("doc_id"),
              explode(graft.functions.HashKernels.gram_md5_keys(col("text"), 8)).as("g8"))
    val train = grams.filter(col("doc_id") % 2 === 0).select(col("g8")).distinct()
    val test = grams.filter(col("doc_id") % 2 === 1).distinct()
    val totals = test.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val hits = test.join(train, "g8")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    totals.join(hits, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
              graft.Det.r4(col("n_hit").cast("double") / col("n_grams")).as("share"))
      .orderBy(col("doc_id").asc)
  }

  /** Canonical-URL dedup (r5): the web-corpus dedup that runs BEFORE any
    * content hashing — fold scheme/case/tracking-param noise away and
    * group by the canonical (lowercased host + path) identity. URLs are
    * synthesized with deterministic noise (upper-cased hosts on every 3rd
    * doc, utm params on every 2nd) since the corpus ships no URL column;
    * canonicalization is codegen'd `parse_url` + `lower`. One shuffle
    * keyed on the canonical string — at 100 TB the group key is ~60 bytes
    * regardless of page size, and the min-doc_id pick per group is the
    * same canonical-representative choice as `dedup_exact`. */
  def dedupUrl(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val noisy = docs
      .withColumn("host",
        when(col("doc_id") % 3 === 0, concat(upper(col("source")), lit(".Example.ORG")))
          .otherwise(concat(col("source"), lit(".example.org"))))
      .withColumn("url", concat(
        lit("https://"), col("host"), lit("/"), col("lang"),
        lit("/page-"), col("doc_id") % 40,
        when(col("doc_id") % 2 === 0,
             concat(lit("?utm_campaign=promo&uid="), col("doc_id"))).otherwise(lit(""))))
    noisy
      .withColumn("canonical",
        concat(lower(parse_url(col("url"), lit("HOST"))),
               parse_url(col("url"), lit("PATH"))))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_doc"))
      .orderBy(col("canonical").asc)
  }

  /** Chunk-level dedup (r5): which 16-token chunks repeat across DISTINCT
    * documents — the paragraph-grain dedup (boilerplate headers, licence
    * blocks, repeated passages) that document-level hashing can't see and
    * substring dedup (suffix arrays) over-kills. Non-overlapping chunks
    * via the one-pass `chunkMd5Keys` StaticInvoke kernel (⌊n/16⌋ keys per
    * doc, stride = size — ~16× fewer keys than the decontam gram
    * explode); the shuffle is keyed on 32-hex md5 keys, never text, and
    * output is only the repeated chunks. */
  def dedupParagraph(spark: SparkSession, dir: String): DataFrame = {
    val chunks = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.HashKernels.chunk_md5_keys(col("text"), 16)).as("h"))
    chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
           count(lit(1)).as("n_occ"),
           min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("h").asc)
  }

  /** Exact k-NN graph (k=3) over a deterministic node sample (every 25th
    * vec_id): node set broadcast, corpus streams, codegen'd VecDot
    * cosine, rank window per node with a vec_id tiebreak. */
  def simKnnGraph(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.PushVecNormThroughJoin.register(spark)
    val emb = t(spark, dir, "embeddings")
    val dbl: Column => Column = c => transform(c, x => x.cast("double"))
    val nodes = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("src"), dbl(col("embedding")).as("src_emb"))
    val corpus = emb.select(col("vec_id").as("dst"), dbl(col("embedding")).as("dst_emb"))
    val dot = graft.functions.VecDot.vec_dot(col("src_emb"), col("dst_emb"))
    val ns = graft.functions.VecDot.vec_norm(col("src_emb"))
    val nd = graft.functions.VecDot.vec_norm(col("dst_emb"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst").asc)
    broadcast(nodes).crossJoin(corpus)
      .filter(col("src") =!= col("dst"))
      .withColumn("cos", dot / (ns * nd))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("src"), col("rnk"), col("dst"), graft.Det.r4(col("cos")).as("cosine"))
      .orderBy(col("src").asc, col("rnk").asc)
  }

  /** PageRank over the event-type transition graph (r5): two fixed power
    * iterations of pr' = 0.15/N + 0.85·Σ pr(u)·w(u,v)/out(u) — the graph-
    * centrality cousin of `embed_pca_power`, over the same edge extraction
    * as `ts_transitions`. Fixed-iteration (not converge-to-ε) so the
    * output is a pure function of the input and the DuckDB CTE chain can
    * be the oracle. Scale shape: the graph is |types|² edges regardless of
    * corpus size (the heavy lift — the lead window + edge count — is one
    * user-keyed shuffle over the events, same as `ts_transitions`); each
    * iteration shuffles |edges| contribution rows. Determinism: per-edge
    * contributions snap to the integer 1e-12 grid pre-sum (exact BIGINT,
    * order-independent), and the damping arithmetic is plain IEEE ops both
    * engines evaluate identically, so iteration 2's INPUT is bit-identical
    * too. */
  // one cached edge set max across invocations (the result is lazy, so
  // the builder can't unpersist its own edges — the NEXT call does)
  private var pagerankEdges: Option[DataFrame] = None

  def graphPagerank(spark: SparkSession, dir: String): DataFrame = synchronized {
    pagerankEdges.foreach(_.unpersist(false))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val edges = t(spark, dir, "events")
      .withColumn("dst", lead(col("event_type"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).as("wgt"))
      .persist() // reused by outw, nodes, and both iterations
    pagerankEdges = Some(edges)
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()
    val nN = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))
    val outw = edges.groupBy(col("src")).agg(sum(col("wgt")).as("outw"))
    def step(pr: DataFrame): DataFrame = {
      val contrib = edges
        .join(pr, edges("src") === pr("node"))
        .join(outw, "src")
        .select(col("dst").as("node"),
          floor(col("pr") * col("wgt") / col("outw") * 1e12 + 0.5)
            .cast("long").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("cg"))
      nodes.join(contrib, Seq("node"), "left")
        .crossJoin(nN)
        .select(col("node"),
          (lit(0.15) / col("n_nodes") +
            lit(0.85) * (coalesce(col("cg"), lit(0L)).cast("double") / 1e12)).as("pr"))
    }
    val pr0 = nodes.crossJoin(nN)
      .select(col("node"), (lit(1.0) / col("n_nodes")).as("pr"))
    step(step(pr0))
      .select(col("node").as("event_type"), graft.Det.r4(col("pr")).as("pagerank"))
      .orderBy(col("event_type").asc)
  }

  /** Cross-document EXACT-SUBSTRING dedup (r12) — the span-level pass
    * from the public "Deduplicating Training Data Makes Language Models
    * Better" recipe, at shingle granularity: any 8-token span occurring
    * in ≥ 2 documents keeps its occurrences only in the LOWEST-doc_id
    * owner; every other document excises the covered token positions
    * and re-emits the scrubbed text. Unlike document-level dedup
    * (`dedup_exact`/`dedup_fuzzy`, which keep or drop whole docs), this
    * removes boilerplate that RIDES otherwise-unique documents —
    * headers, license blocks, templated paragraphs.
    *
    * 100 TB shape: spans travel as md5 keys via the one-pass
    * `gram_md5_keys` kernel (shuffles carry 32-byte hashes + int
    * positions, never text); the duplicated-shingle table is
    * |dup shingles| rows (broadcastable or bloom-gated at scale); the
    * only per-doc state is the doc's OWN token list at re-assembly —
    * bounded by document length, never by corpus size. Output is exact
    * integers + the md5 of the scrubbed text (comparable across
    * engines without shipping text through the compare). */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame =
    dedupSubstringOn(t(spark, dir, "documents").select(col("doc_id"), col("text")))

  private[operators] def dedupSubstringOn(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val sh = docs
      .filter(size(split(col("text"), " ")) >= 8)
      .select(col("doc_id"),
        posexplode(graft.functions.HashKernels.gram_md5_keys(col("text"), 8))
          .as(Seq("gpos", "h")))
    val dup = sh.groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper"),
        countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), col("keeper"))
    val cover = sh.join(dup, "h")
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("gpos"), col("gpos") + lit(7))).as("pos"))
      .distinct()
    val kept = toks.join(cover, Seq("doc_id", "pos"), "left_anti")
    val totals = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_toks"))
    val keptAgg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")))).as("clean_md5"))
    totals.join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        col("clean_md5"))
      .orderBy(col("doc_id").asc)
  }

  /** Triangle counting + global clustering profile (r12) over the
    * co-purchase graph: parts are nodes, an edge joins two parts bought
    * in the same order. The classic DEGREE-ORIENTED algorithm: orient
    * every edge from the (degree, id)-smaller endpoint to the larger,
    * enumerate wedges by joining oriented edges head-to-tail, close
    * them against the oriented edge set. Orientation is the 100 TB
    * device: each wedge is generated at its LOWEST-degree vertex, so
    * per-node wedge work is min(deg)² — O(m^1.5) total on any graph —
    * while the naive undirected wedge join is Σdeg², which a single
    * celebrity node turns into 10¹² pairs. Every shuffle carries
    * fixed-width int pairs; per-order pair expansion is bounded by the
    * order's own line count (TPC-H ≤ 7). Exact integer output: node,
    * edge, open-wedge, and triangle counts (wedges and triangles give
    * the global clustering coefficient 3T/W without a float in sight). */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    // pairs generate MAP-SIDE from one per-order set aggregate — the
    // per-order item count bounds the expansion (TPC-H ≤ 7 lines), so
    // no self-join and no second scan of lineitem
    val perOrder = t(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 20 === 0)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
    val pair = explode(flatten(transform(col("ps"),
      x => transform(filter(col("ps"), y => y > x),
        y => struct(x.as("u"), y.as("v"))))))
    val edges = perOrder.select(pair.as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
      .persist()
    val deg = edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persist()
    val du = deg.select(col("node").as("u"), col("deg").as("du"))
    val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
    val oriented = edges.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
      .persist()
    val e2 = oriented.select(col("src").as("mid"), col("dst").as("fin"))
    val wedges = oriented.join(e2, col("dst") === col("mid"))
      .select(col("src"), col("fin"))
    val e3 = oriented.select(col("src"), col("dst").as("fin"))
    // inner join, not semi: each closed wedge IS one triangle under the
    // total-order orientation (simple graph → no multi-counting)
    val tri = wedges.join(e3, Seq("src", "fin"))
      .agg(count(lit(1)).as("n_triangles"))
    // node + open-wedge stats in ONE pass over deg
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_wedges"))
    val out = degStats
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"))
    val result = out.collect() // 1 row; materialize before unpersist
    edges.unpersist(false); oriented.unpersist(false); deg.unpersist(false)
    spark.createDataFrame(java.util.List.of(result.head), out.schema)
  }

  /** Zipf profile of the corpus vocabulary (r7): term frequencies ranked
    * (rank() with the term as tiebreak — a total order, so the cut at 50
    * is deterministic), emitting freq·rank whose rough constancy IS
    * Zipf's law — the standard sanity probe that a scraped corpus has a
    * natural-language frequency profile rather than boilerplate spam.
    * One hash agg over the token stream (map-side combined); the global
    * rank window — inherently single-partition — runs only on the terms
    * that can still rank ≤ 50: every rank-≤50 term has n ≥ the count at
    * position 50 of the total order, so a 1-row threshold broadcast
    * bounds the window's input to the top slice (+ ties) instead of the
    * whole |vocab| aggregate. */
  def textZipf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = tokens(spark, dir)
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val n50 = freq.orderBy(col("n").desc, col("term").asc).limit(50)
      .agg(min(col("n")).as("n50")) // count at position 50 (1 row)
    freq.crossJoin(broadcast(n50))
      .filter(col("n") >= col("n50"))
      .withColumn("rnk", rank().over(
        Window.orderBy(col("n").desc, col("term").asc)).cast("long"))
      .filter(col("rnk") <= 50)
      .select(col("rnk"), col("term"), col("n"),
        (col("rnk") * col("n")).as("zipf_product"))
      .orderBy(col("rnk").asc, col("term").asc)
  }

  /** `dedup_incremental` (r10): dedup a NEW ingest batch against the
    * ALREADY-INGESTED corpus — the shape production pipelines actually
    * run (within-batch dedup alone re-admits anything ingested last
    * week). Corpus = docs with doc_id % 3 != 0 (standing in for the
    * already-committed table); batch = every doc, so two thirds of it
    * collides. Both sides project to 16-byte md5 content fingerprints
    * BEFORE the join — the text never shuffles, the anti-join moves
    * fingerprints only (at 100 TB: |corpus| 16-byte keys, and the
    * corpus side would come from the graft table's snapshot read, or a
    * bloom prefilter when the batch is small). Batch rows surviving the
    * corpus screen then dedup within-batch (min doc_id per fingerprint
    * via one min(struct) agg — no window, no second shuffle). Output:
    * per-lang admitted counts. */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val corpusFp = docs.filter(col("doc_id") % 3 =!= 0)
      .select(md5(col("text")).as("fp")).distinct()
    val batch = docs.select(md5(col("text")).as("fp"), col("doc_id"), col("lang"))
    val fresh = batch.join(corpusFp, Seq("fp"), "left_anti")
    val kept = fresh
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("lang"))).as("keep"))
      .select(col("keep.doc_id").as("doc_id"), col("keep.lang").as("lang"))
    kept.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_admitted"),
           min(col("doc_id")).as("first_doc"))
      .orderBy(col("lang").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental" -> (dedupIncremental _),
    "text_zipf" -> (textZipf _),
    "dedup_paragraph" -> (dedupParagraph _),
    "dedup_substring" -> (dedupSubstring _),
    "graph_pagerank" -> (graphPagerank _),
    "graph_triangles" -> (graphTriangles _),
    "text_tfidf" -> (textTfidf _),
    "agg_heavy_hitters" -> (aggHeavyHitters _),
    "dedup_url" -> (dedupUrl _),
    "decontam_overlap" -> (decontamOverlap _),
    "sim_knn_graph" -> (simKnnGraph _))

  val oracle: Map[String, String] = Map(
    "dedup_incremental" ->
      """WITH corpus AS (
        |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0
        |), fresh AS (
        |  SELECT md5(text) AS fp, doc_id, lang FROM documents d
        |  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = md5(d.text))
        |), kept AS (
        |  SELECT fp, min(doc_id) AS doc_id FROM fresh GROUP BY fp
        |)
        |SELECT f.lang, count(1) AS n_admitted, min(f.doc_id) AS first_doc
        |FROM fresh f JOIN kept k ON f.fp = k.fp AND f.doc_id = k.doc_id
        |GROUP BY f.lang
        |ORDER BY f.lang ASC NULLS FIRST""".stripMargin,
    "text_zipf" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |freq AS (
        |  SELECT term, count(1) AS n FROM toks WHERE term <> '' GROUP BY term),
        |ranked AS (
        |  SELECT CAST(rank() OVER (ORDER BY n DESC, term ASC) AS BIGINT) AS rnk,
        |         term, n FROM freq)
        |SELECT rnk, term, n, rnk * n AS zipf_product
        |FROM ranked WHERE rnk <= 50
        |ORDER BY rnk ASC NULLS FIRST, term ASC NULLS FIRST""".stripMargin,
    "dedup_paragraph" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |chunks AS (
        |  SELECT doc_id,
        |    md5(list_aggregate(t[g.i * 16 + 1 : g.i * 16 + 16],
        |                       'string_agg', ' ')) AS h
        |  FROM toks,
        |    LATERAL (SELECT unnest(generate_series(0, len(t) // 16 - 1)) AS i) g)
        |SELECT h, count(DISTINCT doc_id) AS n_docs, count(1) AS n_occ,
        |  min(doc_id) AS first_doc
        |FROM chunks
        |GROUP BY h
        |HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY h ASC NULLS FIRST""".stripMargin,
    "dedup_substring" ->
      """WITH toks0 AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |words AS (
        |  SELECT doc_id, g.i AS pos, t[g.i] AS tok
        |  FROM toks0, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g),
        |grams AS (
        |  SELECT doc_id, g.i AS gpos,
        |    md5(list_aggregate(t[g.i:g.i+7], 'string_agg', ' ')) AS h
        |  FROM toks0, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g
        |  WHERE len(t) >= 8),
        |dup AS (
        |  SELECT h, min(doc_id) AS keeper FROM grams
        |  GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |cover AS (
        |  SELECT DISTINCT s.doc_id, c.p
        |  FROM grams s JOIN dup d ON s.h = d.h AND s.doc_id <> d.keeper,
        |    LATERAL (SELECT unnest(generate_series(s.gpos, s.gpos + 7)) AS p) c),
        |kept AS (
        |  SELECT w.doc_id, w.pos, w.tok FROM words w
        |  LEFT JOIN cover c ON w.doc_id = c.doc_id AND w.pos = c.p
        |  WHERE c.doc_id IS NULL),
        |tot AS (SELECT doc_id, count(1) AS n_toks FROM words GROUP BY doc_id),
        |ka AS (
        |  SELECT doc_id, count(1) AS n_kept,
        |    md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, t.n_toks,
        |  CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(t.n_toks - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
        |  ka.clean_md5
        |FROM tot t LEFT JOIN ka ON t.doc_id = ka.doc_id
        |ORDER BY t.doc_id ASC NULLS FIRST""".stripMargin,
    "graph_triangles" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_orderkey % 20 = 0),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT node, count(1) AS deg FROM (
        |    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
        |  GROUP BY node),
        |oriented AS (
        |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
        |              THEN e.u ELSE e.v END AS src,
        |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
        |              THEN e.v ELSE e.u END AS dst
        |  FROM edges e
        |  JOIN deg du ON e.u = du.node
        |  JOIN deg dv ON e.v = dv.node),
        |tri AS (
        |  SELECT count(1) AS n_triangles
        |  FROM oriented e1
        |  JOIN oriented e2 ON e1.dst = e2.src
        |  JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst)
        |SELECT (SELECT count(1) FROM deg) AS n_nodes,
        |  (SELECT count(1) FROM edges) AS n_edges,
        |  (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
        |  (SELECT n_triangles FROM tri) AS n_triangles""".stripMargin,
    "graph_pagerank" ->
      """WITH seq AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS dst
        |  FROM events),
        |edges AS (
        |  SELECT src, dst, count(1) AS wgt FROM seq
        |  WHERE dst IS NOT NULL GROUP BY src, dst),
        |nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
        |nn AS (SELECT count(1) AS n_nodes FROM nodes),
        |outw AS (SELECT src, sum(wgt) AS outw FROM edges GROUP BY src),
        |pr0 AS (
        |  SELECT node, CAST(1 AS DOUBLE) / n_nodes AS pr
        |  FROM nodes CROSS JOIN nn),
        |c1 AS (
        |  SELECT e.dst AS node,
        |    sum(CAST(floor(p.pr * e.wgt / o.outw * 1e12 + 0.5) AS BIGINT)) AS cg
        |  FROM edges e JOIN pr0 p ON e.src = p.node JOIN outw o ON e.src = o.src
        |  GROUP BY e.dst),
        |pr1 AS (
        |  SELECT n.node,
        |    CAST(0.15 AS DOUBLE) / nn.n_nodes
        |      + CAST(0.85 AS DOUBLE) * (CAST(coalesce(c1.cg, 0) AS DOUBLE) / 1e12) AS pr
        |  FROM nodes n LEFT JOIN c1 ON n.node = c1.node CROSS JOIN nn),
        |c2 AS (
        |  SELECT e.dst AS node,
        |    sum(CAST(floor(p.pr * e.wgt / o.outw * 1e12 + 0.5) AS BIGINT)) AS cg
        |  FROM edges e JOIN pr1 p ON e.src = p.node JOIN outw o ON e.src = o.src
        |  GROUP BY e.dst),
        |pr2 AS (
        |  SELECT n.node,
        |    CAST(0.15 AS DOUBLE) / nn.n_nodes
        |      + CAST(0.85 AS DOUBLE) * (CAST(coalesce(c2.cg, 0) AS DOUBLE) / 1e12) AS pr
        |  FROM nodes n LEFT JOIN c2 ON n.node = c2.node CROSS JOIN nn)
        |SELECT node AS event_type,
        |  floor(pr * 10000 + 0.5) / 10000 AS pagerank
        |FROM pr2
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(1) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        |nd AS (SELECT count(1) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf * ((1000 * nd.n_docs) // df.df) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN nd)
        |SELECT doc_id, rnk, term, score FROM (
        |  SELECT doc_id, term, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term ASC) AS INTEGER) AS rnk
        |  FROM scored) t
        |WHERE rnk <= 3
        |ORDER BY doc_id ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin,
    "agg_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tot AS (SELECT count(1) AS total FROM tok)
        |SELECT term, count(1) AS n
        |FROM tok CROSS JOIN tot
        |GROUP BY term, total
        |HAVING count(1) * 30 > total
        |ORDER BY term ASC NULLS FIRST""".stripMargin,
    "decontam_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |grams AS (
        |  SELECT doc_id, md5(list_aggregate(t[g.i:g.i+7], 'string_agg', ' ')) AS g8
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i) g),
        |train AS (SELECT DISTINCT g8 FROM grams WHERE doc_id % 2 = 0),
        |test AS (SELECT DISTINCT doc_id, g8 FROM grams WHERE doc_id % 2 = 1),
        |totals AS (SELECT doc_id, count(1) AS n_grams FROM test GROUP BY doc_id),
        |hits AS (
        |  SELECT doc_id, count(1) AS n_hit FROM test JOIN train USING (g8)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_grams, n_hit,
        |  floor((CAST(n_hit AS DOUBLE) / n_grams) * 10000 + 0.5) / 10000 AS share
        |FROM totals JOIN hits USING (doc_id)
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,
    "dedup_url" ->
      """WITH canon AS (
        |  SELECT doc_id,
        |    lower(CASE WHEN doc_id % 3 = 0
        |               THEN upper(source) || '.Example.ORG'
        |               ELSE source || '.example.org' END)
        |    || '/' || lang || '/page-' || (doc_id % 40) AS canonical
        |  FROM documents)
        |SELECT canonical, count(1) AS n_variants, min(doc_id) AS first_doc
        |FROM canon GROUP BY canonical
        |ORDER BY canonical ASC NULLS FIRST""".stripMargin,
    "sim_knn_graph" ->
      """SELECT src, rnk, dst, floor(cos * 10000 + 0.5) / 10000 AS cosine FROM (
        |  SELECT q.vec_id AS src, c.vec_id AS dst,
        |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos,
        |    CAST(row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id ASC) AS INTEGER) AS rnk
        |  FROM embeddings q CROSS JOIN embeddings c
        |  WHERE q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id) t
        |WHERE rnk <= 3
        |ORDER BY src ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin)
}
