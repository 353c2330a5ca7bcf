package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe data prep (r14, VERDICT r13 #7): materialize a 10×
  * corpus from sf0.1 so the commit-heavy lifecycle queries can be
  * slope-tested once at sf1-equivalent volume. Keys SHIFT per copy
  * (`key + i × stride`) instead of duplicating — per-key uniqueness is
  * what MERGE conditions, dedup fingerprints, and CDC keys assume, and
  * a naive union would turn every one of them into a cardinality
  * violation rather than a bigger input. Join keys shift with the same
  * stride on both sides (orders ↔ lineitem), so join selectivity is
  * scale-invariant. Non-keyed dimension tables copy through unchanged.
  *
  * Usage: ScaleProbe <srcDir> <outDir> [factor]
  * then:  SPARK_GRAFT_SF_DIR=<outDir> graft.Bench (with SPARK_GRAFT_ONLY). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (table, key columns to shift). Orders/lineitem share o_orderkey /
    // l_orderkey so the FK survives; per-table surrogate ids shift too.
    val keyed = Map(
      "orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey"),
      "documents" -> Seq("doc_id"),
      "events" -> Seq("event_id"),
      "embeddings" -> Seq("vec_id"))
    val copyThrough = Seq("region", "nation", "customer", "supplier", "part")

    // one stride for the orderkey family, one per other table — a round
    // power of ten above the max so shifted keys never collide
    def strideOf(table: String, col0: String): Long = {
      val mx = Tables.t(spark, src, table).agg(max(col(col0))).head.getLong(0)
      var s = 1L
      while (s <= mx) s *= 10
      s
    }
    val orderStride = strideOf("orders", "o_orderkey")

    keyed.foreach { case (t, keys) =>
      val df = Tables.t(spark, src, t)
      val stride =
        if (t == "orders" || t == "lineitem") orderStride
        else strideOf(t, keys.head)
      val scaled = (0 until factor).map { i =>
        keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * stride)))
      }.reduce(_ unionAll _)
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleprobe] $t x$factor (stride $stride)")
    }
    copyThrough.foreach { t =>
      Tables.t(spark, src, t).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleprobe] $t copied 1x")
    }
    spark.stop()
  }
}
