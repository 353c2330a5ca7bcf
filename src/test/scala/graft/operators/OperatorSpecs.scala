package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{TopKAggregator, UdxOps}

/** Operator-level assertions that the DuckDB oracle cannot express:
  * sketch accuracy, typed-aggregator semantics, LSH recall. */
class OperatorSpecs extends SparkTestBase {

  // NB: approx_count_distinct's default 5% rsd is a STANDARD DEVIATION,
  // not a bound — assert 3x rsd so a correctly-behaving sketch can't flake
  // the suite on a different corpus or Spark version.
  test("agg_approx_distinct: HLL estimate within 3x rsd (15%) of exact (SURVEY.md §2.B)") {
    val approx = Aggregates.aggApproxDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_parts").toDouble).toMap
    val exact = graft.Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_partkey")).as("e"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("e").toDouble).toMap
    assert(approx.nonEmpty && approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      assert(math.abs(a - exact(k)) / exact(k) <= 0.15,
        s"HLL off by >15% (3x rsd) for $k: approx=$a exact=${exact(k)}")
    }
  }

  test("agg_sketch_merge: unioned per-site HLL sketches estimate within 3% of exact") {
    val approx = Aggregates.aggSketchMerge(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_parts").toDouble).toMap
    val exact = graft.Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_partkey")).as("e"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("e").toDouble).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    // Datasketches HLL at default lgK=12 has rse ~1.04/sqrt(2^12) ~ 1.6%;
    // 3% ~ 2x rse so a healthy sketch can't flake this
    approx.foreach { case (k, a) =>
      assert(math.abs(a - exact(k)) / exact(k) <= 0.03,
        s"merged HLL off by >3% for $k: approx=$a exact=${exact(k)}")
    }
  }

  test("agg_count_min: merged per-site CMS estimates are one-sided within eps*N") {
    val rows = Aggregates.aggCountMin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_exact")).sum
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"))
      // CMS NEVER under-counts, and over-counts by at most eps*N (w.h.p.;
      // deterministic here — fixed seed, fixed data)
      assert(est >= exact, s"CMS under-counted ${r.getString(0)}: $est < $exact")
      assert(est <= exact + math.ceil(0.001 * total).toLong,
        s"CMS over-counted past eps*N for ${r.getString(0)}")
      assert(r.getAs[Boolean]("within_bound"))
    }
  }

  test("count_min family: SQL-registered; two-site merge equals the single-pass sketch") {
    import graft.functions.CountMin
    Seq(CountMin.aggDescription, CountMin.mergeDescription, CountMin.estimateDescription)
      .foreach { case (i, f, b) =>
        spark.sessionState.functionRegistry.registerFunction(i, f, b) }
    graft.Tables.t(spark, sfDir, "orders").createOrReplaceTempView("cm_orders")
    val merged = spark.sql(
      """SELECT count_min_estimate(count_min_merge(sk), '1-URGENT') AS e
        |FROM (SELECT count_min(o_orderpriority, 0.001, 0.99, 42) AS sk
        |      FROM cm_orders GROUP BY o_orderkey % 2)""".stripMargin)
      .collect()(0).getLong(0)
    val single = spark.sql(
      """SELECT count_min_estimate(
        |  count_min(o_orderpriority, 0.001, 0.99, 42), '1-URGENT') AS e
        |FROM cm_orders""".stripMargin).collect()(0).getLong(0)
    // CMS is a LINEAR sketch: same-seed per-site tables add cell-wise, so
    // the merged estimate must EQUAL the single-pass one, not approximate it
    assert(merged == single, s"merge broke linearity: $merged != $single")
    val exact = graft.Tables.t(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(merged >= exact, "CMS must never under-count")
  }

  test("sink_compact: 64 fragment files collapse to <=2 without row loss") {
    val n = RelationalOps.sinkCompact(spark, sfDir)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(n == graft.Tables.t(spark, sfDir, "documents").count())
    def parts(p: String) = new java.io.File(s"${graft.Tables.scratchDir}/$p")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts("compact_frag") == 64)
    assert(parts("compact_out") <= 2 && parts("compact_out") >= 1)
  }

  test("partitioned sink: per-partition layout and pruned read-back") {
    val out = java.nio.file.Files.createTempDirectory("graft-part-spec").toString
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    // hive-style directories, one per language
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh"))
    // a lang-filtered read must PRUNE partitions, not scan-and-filter
    val probe = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition pruning in plan:\n$plan")
    assert(probe.count() ==
      graft.Tables.t(spark, sfDir, "documents").filter(col("lang") === "en").count())
  }

  test("agg_approx_percentile: sketch within 1% of the exact percentile") {
    val approx = Aggregates.aggApproxPercentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Aggregates.aggPercentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (k, (a50, a90, a99)) =>
      val (e50, e90, e99) = exact(k)
      Seq((a50, e50), (a90, e90), (a99, e99)).foreach { case (a, e) =>
        assert(math.abs(a - e) / e <= 0.01, s"approx pct off for $k: $a vs $e") }
    }
  }

  test("udaf_topk: typed Aggregator returns the true per-group top-3") {
    import spark.implicits._
    val got = UdxOps.udafTopk(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val expected = graft.Tables.t(spark, sfDir, "orders")
      .select($"o_orderstatus", $"o_totalprice").as[(String, Double)].collect()
      .groupBy(_._1).toSeq.flatMap { case (st, vs) =>
        vs.map(_._2).sorted(Ordering[Double].reverse).take(3).zipWithIndex
          .map { case (v, i) => (st, i, math.round(v * 100).toDouble / 100) }
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected)
  }

  test("TopKAggregator merge keeps global top-k across partitions") {
    val agg = new TopKAggregator(3)
    val merged = agg.merge(agg.reduce(agg.reduce(agg.zero, 5.0), 1.0),
                           agg.reduce(agg.reduce(agg.zero, 9.0), 7.0))
    assert(agg.finish(merged) == Seq(9.0, 7.0, 5.0))
  }

  test("dedup_fuzzy: banded MinHash + Jaccard filter finds exactly the injected near-dups") {
    val rows = LlmOps.dedupFuzzy(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val pairs = rows.map(_._1).toSet
    // the query injects mutated copies of the 3 lowest doc_ids as id+1e6
    val lowest = graft.Tables.t(spark, sfDir, "documents")
      .orderBy(col("doc_id").asc).limit(3).collect().map(_.getAs[Long]("doc_id"))
    lowest.foreach { id =>
      assert(pairs.contains((id, id + 1000000L)),
        s"near-dup pair for doc $id not found in ${pairs.size} survivors")
    }
    // precision stage: everything surviving has high exact similarity
    rows.foreach { case (p, j) => assert(j >= 0.7, s"pair $p below threshold: $j") }
  }

  test("join_bloom_prefilter and sim_ann_ivf carry no ScalaUDF: hot paths are static kernels") {
    // the bloom gate and the IVF cell assignment were interpreted UDFs in
    // earlier rounds; both are StaticInvoke kernels now — a ScalaUDF node
    // would break whole-stage codegen on the fact/corpus scan
    Seq(
      "join_bloom_prefilter" -> ScaleJoins.joinBloomPrefilter(spark, sfDir),
      "sim_ann_ivf" -> LlmOpsExt.simAnnIvf(spark, sfDir)
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("UDF"), s"$name plan still has a ScalaUDF:\n$plan")
      assert(plan.toLowerCase.contains("staticinvoke") || plan.contains("bloomMightContain")
        || plan.contains("ivfTopCells"), s"$name plan missing the static kernel:\n$plan")
    }
  }

  test("sim_topk: exact brute-force agrees with an independent local computation") {
    import spark.implicits._
    val got = LlmOps.simTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val expected = emb.filter(_._1 < 10).flatMap { case (q, qe) =>
      emb.filter(_._1 != q).map { case (c, ce) => (q, c, cos(qe, ce)) }
        .sortBy { case (_, c, s) => (-s, c) }.take(5).zipWithIndex
        .map { case ((_, c, _), i) => (q, i + 1, c) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == expected.toSeq)
  }
}
