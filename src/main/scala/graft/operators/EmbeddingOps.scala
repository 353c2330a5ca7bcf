package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Embedding-column preprocessing for the LLM-pipeline surface (prompt:
  * similarity search needs normalized / quantized vectors long before any
  * index is built). All arithmetic is per-row over the vector column via
  * codegen'd higher-order functions — map-side only, NO shuffle, NO UDF —
  * so these scale embarrassingly at 100 TB: throughput = scan throughput.
  *
  * Determinism: elements are cast float→double (exact) first; folds are
  * short (64 dims) so the ±1 ulp association slack vs DuckDB's list
  * functions is absorbed by `Det.r4`; the quantizer emits exact integers
  * (floor over identically-computed doubles), so its outputs hash-match
  * with no rounding at all.
  */
object EmbeddingOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  // codegen'd native self-dot (graft.functions.VecDot) — same sequential
  // fold as aggregate((a,x) => a + x*x), so oracle hashes are unchanged
  private def l2(v: Column): Column = graft.functions.VecDot.vec_norm(v)

  /** Per-vector geometry: dimension, L2 norm, max |component|, and the
    * first component of the unit-normalized vector. */
  def embedNormalize(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
              size(col("v")).as("dim"),
              Det.r4(l2(col("v"))).as("l2_norm"),
              Det.r4(array_max(transform(col("v"), x => abs(x)))).as("max_abs"),
              Det.r4(element_at(col("v"), 1) / l2(col("v"))).as("x0_unit"))
      .orderBy(col("vec_id").asc)

  /** Symmetric int8 quantization (scale = 127 / max|x|, round-half-up via
    * floor(x·scale + 0.5)): per-vector integer checksum and saturation
    * count — exact integers, bit-identical across engines. The int8 codes
    * are what a 100 TB ANN index stores: 4× smaller than float32, and the
    * transform is a pure map over the scan. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("scale", lit(127.0) / array_max(transform(col("v"), x => abs(x))))
      .withColumn("q", transform(col("v"), x => floor(x * col("scale") + 0.5)))
      .select(col("vec_id"),
              aggregate(col("q"), lit(0L), (a, x) => a + x).as("checksum"),
              size(filter(col("q"), x => abs(x) === 127)).cast("long").as("n_sat"))
      .orderBy(col("vec_id").asc)

  /** One distributed power-iteration step (r5): y = Σᵢ xᵢ (xᵢ·v₀) with
    * start vector v₀ = e₁, i.e. yⱼ = Σᵢ xᵢⱼ·xᵢ₁ — the building block of
    * PCA / spectral methods (y converges to the top principal direction
    * under repetition). Scale shape: per-row work is a map (one dot + one
    * scale), the only shuffle carries |dim| = 64 groups of partial sums —
    * at 100 TB the step costs one scan + a 64-row aggregate, and each
    * further iteration is the same. Determinism: per-element products are
    * snapped to an integer 1e-12 grid (floor — pure IEEE, bit-identical
    * in both engines) so the cross-partition sum is an exact BIGINT,
    * order-independent across 1000 executors. */
  def embedPcaPower(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
      .withColumn("s", element_at(col("v"), 1))
      .select(col("s"), posexplode(col("v")).as(Seq("j", "x")))
      .groupBy(col("j"))
      .agg(sum(floor(col("x") * col("s") * 1e12 + 0.5).cast("long")).as("y_grid"))
      .select(col("j"),
              Det.r4(col("y_grid").cast("double") / 1e12).as("y"))
      .orderBy(col("j").asc)

  /** Per-class centroid embeddings (r5): the mean vector per label — what
    * clustering-based curation (SemDeDup-style pruning, class-balanced
    * sampling, IVF codebook seeding) computes first. Scale shape: one
    * map-side-combined agg whose shuffle carries |labels|·dim partial-sum
    * groups (640 here) regardless of corpus size. Determinism: per-element
    * values snap to the integer 1e-12 grid before summing (same device as
    * `embed_pca_power`), so partial sums are exact BIGINTs and the final
    * mean is one double division both engines evaluate identically. */
  def embedCentroid(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("label"),
              posexplode(col("embedding").cast("array<double>")).as(Seq("j", "x")))
      .groupBy(col("label"), col("j"))
      .agg(sum(floor(col("x") * 1e12 + 0.5).cast("long")).as("g"),
           count(lit(1)).as("n"))
      .select(col("label"), col("j"), col("n"),
              Det.r4(col("g").cast("double") / 1e12 / col("n")).as("centroid"))
      .orderBy(col("label").asc, col("j").asc)

  /** Embedding OUTLIER screen (r12): per-vector squared distance to its
    * label's centroid — the quality gate that drops mis-embedded /
    * mislabeled vectors before they poison an ANN index or a
    * class-balanced sample. Scale shape: the centroid table is
    * |labels|·dim rows (640 here) and BROADCASTS; the per-vector pass is
    * one exploded map-side join + a (label, vec_id) re-agg — no
    * all-pairs anything, cost = one scan at any corpus size.
    * Determinism: centroids come from the exact 1e-12 grid (same device
    * as [[embedCentroid]]), per-dimension squared deviations snap to a
    * 1e-8 grid as BIGINTs, so distances are EXACT integers and the
    * outlier threshold is an integer compare — no boundary flicker
    * between engines. */
  def embedOutlier(spark: SparkSession, dir: String): DataFrame = {
    val flat = t(spark, dir, "embeddings")
      .select(col("label"), col("vec_id"),
              posexplode(col("embedding").cast("array<double>")).as(Seq("j", "x")))
    val cent = flat.groupBy(col("label"), col("j"))
      .agg(sum(floor(col("x") * 1e12 + 0.5).cast("long")).as("g"),
           count(lit(1)).as("n"))
      .select(col("label"), col("j"),
              (col("g").cast("double") / 1e12 / col("n")).as("c"))
    val d2 = flat.join(broadcast(cent), Seq("label", "j"))
      .withColumn("dg",
        floor((col("x") - col("c")) * (col("x") - col("c")) * 1e8 + 0.5)
          .cast("long"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(col("dg")).as("d2"))
    d2.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
           sum((col("d2") > lit(200000000L)).cast("long")).as("n_outliers"),
           max(col("d2")).as("max_d2"))
      .orderBy(col("label").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_pca_power" -> (embedPcaPower _),
    "embed_centroid" -> (embedCentroid _),
    "embed_normalize" -> (embedNormalize _),
    "embed_outlier" -> (embedOutlier _),
    "embed_quantize" -> (embedQuantize _))

  val oracle: Map[String, String] = Map(
    "embed_outlier" ->
      """WITH e AS (
        |  SELECT label, vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |flat AS (
        |  SELECT label, vec_id, g.j AS j, v[g.j] AS x
        |  FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) g),
        |cent AS (
        |  SELECT label, j,
        |    CAST(sum(CAST(floor(x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
        |      / 1e12 / count(1) AS c
        |  FROM flat GROUP BY label, j),
        |d AS (
        |  SELECT f.label, f.vec_id,
        |    sum(CAST(floor((f.x - c.c) * (f.x - c.c) * 1e8 + 0.5) AS BIGINT)) AS d2
        |  FROM flat f JOIN cent c ON f.label = c.label AND f.j = c.j
        |  GROUP BY f.label, f.vec_id)
        |SELECT label, count(1) AS n_vecs,
        |  CAST(sum(CASE WHEN d2 > 200000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(max(d2) AS BIGINT) AS max_d2
        |FROM d GROUP BY label
        |ORDER BY label ASC NULLS FIRST""".stripMargin,
    "embed_centroid" ->
      """WITH e AS (
        |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |flat AS (
        |  SELECT label, g.j - 1 AS j,
        |    CAST(floor(v[g.j] * 1e12 + 0.5) AS BIGINT) AS p
        |  FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) g)
        |SELECT label, CAST(j AS INTEGER) AS j, count(1) AS n,
        |  floor((CAST(sum(p) AS DOUBLE) / 1e12 / count(1)) * 10000 + 0.5) / 10000 AS centroid
        |FROM flat GROUP BY label, j
        |ORDER BY label ASC NULLS FIRST, j ASC NULLS FIRST""".stripMargin,
    "embed_pca_power" ->
      """WITH e AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |x AS (SELECT v, v[1] AS s FROM e),
        |flat AS (
        |  SELECT g.j - 1 AS j,
        |    CAST(floor(v[g.j] * s * 1e12 + 0.5) AS BIGINT) AS p
        |  FROM x CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) g)
        |SELECT CAST(j AS INTEGER) AS j,
        |  floor((CAST(sum(p) AS DOUBLE) / 1e12) * 10000 + 0.5) / 10000 AS y
        |FROM flat GROUP BY j
        |ORDER BY j ASC NULLS FIRST""".stripMargin,
    "embed_normalize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT vec_id,
        |  CAST(len(v) AS INTEGER) AS dim,
        |  floor(sqrt(list_sum(list_transform(v, x -> x * x))) * 10000 + 0.5) / 10000 AS l2_norm,
        |  floor(list_max(list_transform(v, x -> abs(x))) * 10000 + 0.5) / 10000 AS max_abs,
        |  floor((v[1] / sqrt(list_sum(list_transform(v, x -> x * x)))) * 10000 + 0.5) / 10000 AS x0_unit
        |FROM e ORDER BY vec_id ASC NULLS FIRST""".stripMargin,
    "embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |m AS (
        |  SELECT vec_id, v,
        |    127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
        |  FROM e),
        |q AS (
        |  SELECT vec_id,
        |    list_transform(v, x -> floor(x * scale + 0.5)) AS qv
        |  FROM m)
        |SELECT vec_id,
        |  CAST(list_sum(qv) AS BIGINT) AS checksum,
        |  CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
        |FROM q ORDER BY vec_id ASC NULLS FIRST""".stripMargin)
}
