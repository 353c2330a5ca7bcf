package graft.functions

import graft.SparkTestBase

/** KLL quantile sketch family (r18, VERDICT r17 #1): build / merge /
  * quantile — exact below k=200 retained values (no compaction yet), so
  * small-input assertions are deterministic equalities; merge is the
  * roll-up contract the MV path rides. */
class KllSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("kll_agg + kll_quantile: exact quantiles below k; NULL/NaN rows contribute no rank; empty -> NULL") {
    val df = (1 to 100).map(i => (if (i % 2 == 0) "a" else "b", i.toDouble))
      .toDF("g", "x")
    df.createOrReplaceTempView("kll_t")
    val rows = spark.sql(
      """SELECT g, kll_quantile(kll_agg(x), 0.5D) AS p50,
        |       kll_quantile(kll_agg(x), 1.0D) AS mx
        |FROM kll_t GROUP BY g ORDER BY g""".stripMargin).collect()
    // group a = evens 2..100 (median inclusive-rank = 50), b = odds 1..99
    assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq(("a", 50.0, 100.0), ("b", 49.0, 99.0)))
    // NULL and NaN inputs are skipped, not ranked
    val withNulls = Seq(Some(1.0), None, Some(3.0), Some(Double.NaN))
      .toDF("x")
    withNulls.createOrReplaceTempView("kll_n")
    assert(spark.sql(
      "SELECT kll_quantile(kll_agg(x), 1.0D) FROM kll_n").head.getDouble(0) == 3.0)
    // all-NULL group: empty sketch -> NULL quantile
    assert(spark.sql(
      "SELECT kll_quantile(kll_agg(CAST(NULL AS DOUBLE)), 0.5D) FROM kll_t")
      .head.isNullAt(0))
  }

  test("kll_merge rolls up per-group sketches: union of halves == build over all (exact regime)") {
    (1 to 100).map(i => (if (i <= 50) "lo" else "hi", i.toDouble))
      .toDF("g", "x").createOrReplaceTempView("kll_m")
    val merged = spark.sql(
      """SELECT kll_quantile(kll_merge(sk), 0.5D) AS p50,
        |       kll_quantile(kll_merge(sk), 0.25D) AS p25
        |FROM (SELECT g, kll_agg(x) AS sk FROM kll_m GROUP BY g)""".stripMargin)
      .head
    val direct = spark.sql(
      """SELECT kll_quantile(kll_agg(x), 0.5D) AS p50,
        |       kll_quantile(kll_agg(x), 0.25D) AS p25 FROM kll_m""".stripMargin)
      .head
    assert(merged.getDouble(0) == direct.getDouble(0) &&
      merged.getDouble(1) == direct.getDouble(1),
      s"merge-of-halves must equal direct build below k: $merged vs $direct")
    // kll_merge over zero sketches (all-NULL input) -> NULL
    assert(spark.sql(
      "SELECT kll_quantile(kll_merge(CAST(NULL AS BINARY)), 0.5D) FROM kll_m")
      .head.isNullAt(0))
  }

  test("estimate stays within the KLL rank-error bound past compaction (100k values)") {
    spark.range(1, 100001).selectExpr("CAST(id AS DOUBLE) AS x")
      .createOrReplaceTempView("kll_big")
    val p50 = spark.sql(
      "SELECT kll_quantile(kll_agg(x), 0.5D) FROM kll_big").head.getDouble(0)
    // k=200 two-sided normalized rank error ~1.65%; assert 3% slack
    assert(math.abs(p50 - 50000.0) < 3000.0, s"p50=$p50 out of bound")
  }
}
