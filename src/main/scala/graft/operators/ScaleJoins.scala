package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew and co-location techniques for 100 TB joins (prompt: "salting for
  * skew, bucketing for co-located joins"). Both queries produce results a
  * plain join would — the DuckDB oracle checks exactly that — while the
  * physical plan demonstrates the scale-safe shape.
  */
object ScaleJoins {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  private val Salts = 8

  /** Skew-safe join: lineitem ⋈ a 3-row dimension on l_returnflag — a
    * worst-case skewed key (3 distinct values over the whole fact table).
    * A plain shuffle join would put ~1/3 of 100 TB on single reducers.
    * Salting: fact side gets salt = hash(unique key) mod 8; the dim side
    * is replicated ×8 with an explicit salt column; the join key becomes
    * (flag, salt), spreading each hot key over 8 reducers. (With a dim
    * this small one would really broadcast — the salt pattern is what
    * scales when BOTH sides are too big to broadcast, so the join is
    * hinted shuffle-merge to force the shuffle path being demonstrated.) */
  def joinSkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val flagNames = spark.createDataFrame(Seq(
      ("A", "returned"), ("N", "in_flight"), ("R", "refused"))).toDF("flag", "flag_name")
    val salted = flagNames.crossJoin(
      spark.range(Salts).select(col("id").cast("int").as("salt")))
    val fact = t(spark, dir, "lineitem")
      .withColumn("salt",
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(Salts)))
    fact.join(salted.hint("merge"),
        col("l_returnflag") === col("flag") && fact("salt") === salted("salt"))
      .groupBy(col("flag_name"))
      .agg(count(lit(1)).as("n"),
           round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"))
      .orderBy(col("flag_name").asc)
  }

  /** Bucketed co-located join: both sides written bucketed by the join key
    * (8 buckets, sorted), then joined — the physical plan has NO shuffle
    * exchange on either side (bucket pruning + per-bucket sort-merge). At
    * 100 TB this is THE pattern for repeated joins on a stable key:
    * shuffle once at write time, never again at read time. */
  // bucketing is WRITE-ONCE by design (shuffle at layout time, never at
  // read time) — re-bucketing identical input per invocation would bill
  // the one-time layout cost to every query; remember what's laid out
  private var bucketedFor: Option[String] = None

  def joinBucketed(spark: SparkSession, dir: String): DataFrame = synchronized {
    // keep the Derby metastore inside the repo regardless of launch cwd
    System.setProperty("derby.system.home", Tables.scratchDir)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    val wh = s"${Tables.scratchDir}/bucketed"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_buckets LOCATION '$wh'")
    if (!bucketedFor.contains(dir)) {
      t(spark, dir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b")
        .saveAsTable("graft_buckets.orders_b")
      t(spark, dir, "customer")
        .write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b")
        .saveAsTable("graft_buckets.customer_b")
      bucketedFor = Some(dir)
    }
    // hint merge: with both sides bucketed+sorted on the key, sort-merge
    // join needs NO Exchange (a broadcast would hide the point at test SF)
    spark.table("graft_buckets.orders_b").hint("merge")
      .join(spark.table("graft_buckets.customer_b").hint("merge"),
            col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(dec("o_totalprice")), 2).cast("double").as("revenue"))
      .orderBy(col("c_nationkey").asc)
  }

  /** Runtime-filter join: a Bloom filter built over the (filtered) dim
    * keys prefilters the fact table BEFORE its shuffle, so only rows that
    * can possibly join pay shuffle cost; the exact join afterwards removes
    * the Bloom false positives, so results equal a plain join (which is
    * what the oracle checks). This is the manual form of Spark's own
    * InjectRuntimeFilter: at 100 TB the sketch (~1.2 MB here, sized
    * ∝ |dim keys|) ships as a plan constant (task-binary broadcast) and
    * discards ~96% of the fact scan output (URGENT ≈ 1/5 of orders, FPP
    * 1%) pre-shuffle. The gate is a StaticInvoke static kernel
    * (HashKernels.bloomMightContain), not a ScalaUDF — the fact scan
    * stays inside whole-stage codegen (OperatorSpecs pins that). */
  def joinBloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    val dim = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    // one pass over the dim side builds the mergeable sketch (treeAggregate)
    val bf = dim.stat.bloomFilter("o_orderkey", 1000000L, 0.01)
    t(spark, dir, "lineitem")
      .filter(graft.functions.HashKernels.bloom_might_contain(col("l_orderkey"), bf))
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc)
  }

  /** Engine-native runtime filter (the counterpart of the MANUAL
    * [[joinBloomPrefilter]]): Spark's own `InjectRuntimeFilter` rule
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by default in
    * Spark 4) derives the same dim-keys bloom and plants
    * `bloom_filter_might_contain` under the fact scan — no hand-built
    * sketch, no StaticInvoke kernel. The builder is a plain
    * selective-dim shuffle join (`merge` hints keep the SMJ path the rule
    * targets; a broadcast join would get its pruning from the broadcast
    * itself). Injection is gated on production-scale stats — application
    * side above `…applicationSideScanSizeThreshold` (10 GB default) — so
    * at test SF the plan is an ordinary SMJ and results are unaffected
    * either way (the filter only ever REMOVES non-joining rows);
    * PlanAuditSpec lowers the thresholds and pins the injected
    * `bloom_filter_might_contain` in the optimized plan. */
  def joinBloomNative(spark: SparkSession, dir: String): DataFrame = {
    val dim = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_orderkey"))
    t(spark, dir, "lineitem").hint("merge")
      .join(dim.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc)
  }

  /** Range join at scale: `join_theta_range` broadcasts one side, which
    * dies when BOTH sides are big. The scale technique: quantize the range
    * dimension into width-W buckets, expand the probe side to the ≤3
    * buckets its window can touch, EQUI-join on bucket (shuffle-hash — a
    * partitionable key!), then apply the exact range predicate. Here:
    * each purchase event matched to clicks within ±5.0 in value; result
    * is per-purchase neighbor count + closest distance, which the oracle
    * reproduces with a plain (quadratic) theta join. */
  def joinRangeBucketed(spark: SparkSession, dir: String): DataFrame = {
    val W = 5.0
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("value").as("pv"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("value").as("cv"))
      .withColumn("bucket", floor(col("cv") / W).cast("long"))
    purchases
      .withColumn("bucket", explode(sequence(
        floor((col("pv") - W) / W).cast("long"),
        floor((col("pv") + W) / W).cast("long"))))
      // at test SF Catalyst would broadcast; hint the shuffle-hash path the
      // pattern exists for (both sides big, bucket is the partitionable key)
      .join(clicks.hint("shuffle_hash"), "bucket")
      .filter(abs(col("pv") - col("cv")) <= W)
      .groupBy(col("p_id"))
      .agg(count(lit(1)).as("n_close"),
           graft.Det.r4(min(abs(col("pv") - col("cv")))).as("min_diff"))
      .orderBy(col("p_id").asc)
  }

  /** Dynamic partition pruning (r5): the fact table is laid out
    * partitioned by `ship_year`; the dim side is a selective filter whose
    * matching years are only known at RUN time. Catalyst's DPP inserts a
    * `dynamicpruning` subquery on the fact scan: the dim side is executed
    * first (reusing the broadcast), and only the fact PARTITIONS whose
    * `ship_year` survives are ever read. At 100 TB with years as
    * partitions this is the difference between scanning 7 years and
    * scanning 1 — the partition-elimination analog of the bloom join's
    * row elimination. DppPlanSpec pins `dynamicpruningexpression` in the
    * physical plan; the oracle is the same join computed directly. */
  def joinDpp(spark: SparkSession, dir: String): DataFrame = {
    val sf = dir.replaceAll(".*/", "")
    val factPath = s"${Tables.scratchDir}/dpp_fact_$sf"
    // one-time layout per SF dir (idempotent): lineitem partitioned by year
    if (!new java.io.File(factPath, "_SUCCESS").exists()) {
      t(spark, dir, "lineitem")
        .withColumn("ship_year", year(col("l_shipdate")))
        .write.mode("overwrite").partitionBy("ship_year").parquet(factPath)
    }
    val fact = spark.read.parquet(factPath)
    // selective dim: years containing a top-price urgent order — the
    // surviving year set is RUNTIME-only knowledge (no static predicate
    // on the join key exists for Catalyst to push down instead)
    val dim = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 490000.0)
      .select(year(col("o_orderdate")).as("ship_year")).distinct()
    fact.join(dim, Seq("ship_year"))
      .groupBy(col("ship_year"))
      .agg(count(lit(1)).as("n_rows"),
           round(sum(dec("l_extendedprice")), 2).cast("double").as("sum_price"))
      .orderBy(col("ship_year").asc)
  }

  /** AQE skew join (r5): the RUNTIME answer to `join_skew_salted` — a
    * deliberately skewed key (l_orderkey mod 10 < 9 all collapse to 'K0',
    * ~90% of the fact) sort-merge-joined to a 10-row dim with NO manual
    * salting. Under AQE with skew thresholds met, the final adaptive plan
    * splits the oversized partition into advisory-sized slices and
    * replicates the matching dim rows (`SortMergeJoin(skew=true)`) — same
    * effect as salting, decided from actual runtime sizes instead of
    * guessed at authoring time. The query itself is the plain join (the
    * oracle is the same join in SQL); PlanAuditSpec lowers the thresholds
    * to sf-test scale and pins the skew=true marker in the executed plan. */
  def joinAqeSkew(spark: SparkSession, dir: String): DataFrame = {
    val dim = spark.createDataFrame(
      (0 to 9).map(i => (s"K$i", s"bucket_$i"))).toDF("k", "k_name")
    val fact = t(spark, dir, "lineitem")
      .withColumn("k",
        when(pmod(col("l_orderkey"), lit(10)) < 9, lit("K0"))
          .otherwise(concat(lit("K"), pmod(col("l_orderkey"), lit(10)))))
      // AQE splits a skewed reduce partition along MAPPER boundaries — a
      // 100 TB table has thousands of map tasks, but the sf-test parquet
      // is one split, so fabricate map parallelism the real table would
      // have (8 mappers ⇒ the hot partition is splittable 8 ways)
      .repartition(8, col("l_orderkey"), col("l_linenumber"))
    fact.join(dim.hint("merge"), "k")
      .groupBy(col("k_name"))
      .agg(count(lit(1)).as("n"),
           round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"))
      .orderBy(col("k_name").asc)
  }

  /** Exchange reuse (r5): a self-join whose two inputs are the IDENTICAL
    * subplan — intra-order line pairs (same l_orderkey, strictly ordered
    * linenumbers, the classic market-basket / co-occurrence shape).
    * Catalyst's ReuseExchange rule canonicalizes both sides to the same
    * shuffle and mounts the second on a ReusedExchange/reused stage: the
    * table is scanned and shuffled ONCE, not twice — at 100 TB that
    * halves the dominant cost of every self-join analytics pass.
    * PlanAuditSpec pins the reuse marker in the executed plan. */
  def joinSelfReuse(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val a = li.toDF("k", "ln_a", "q_a")
    val b = li.toDF("k", "ln_b", "q_b")
    // merge hint: at sf-test scale the planner would broadcast one side
    // (nothing to reuse); a 100 TB self-join is SMJ, where both sides
    // want the SAME hashpartitioning(k) exchange — the shape under test
    a.join(b.hint("merge"), Seq("k"))
      .filter(col("ln_a") < col("ln_b"))
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("k")).as("n_orders"),
           round(sum((col("q_a") + col("q_b")).cast("decimal(18,2)")), 2)
             .cast("double").as("sum_pair_qty"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_self_reuse" -> (joinSelfReuse _),
    "join_aqe_skew" -> (joinAqeSkew _),
    "join_dpp" -> (joinDpp _),
    "join_range_bucketed" -> (joinRangeBucketed _),
    "join_skew_salted" -> (joinSkewSalted _),
    "join_bloom_prefilter" -> (joinBloomPrefilter _),
    "join_bloom_native" -> (joinBloomNative _),
    "join_bucketed" -> (joinBucketed _))

  val oracle: Map[String, String] = Map(
    "join_self_reuse" ->
      """SELECT count(1) AS n_pairs,
        |  count(DISTINCT a.l_orderkey) AS n_orders,
        |  CAST(round(sum(CAST(a.l_quantity + b.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_pair_qty
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber""".stripMargin,
    "join_aqe_skew" ->
      """WITH dim AS (
        |  SELECT * FROM (VALUES
        |    ('K0','bucket_0'), ('K1','bucket_1'), ('K2','bucket_2'),
        |    ('K3','bucket_3'), ('K4','bucket_4'), ('K5','bucket_5'),
        |    ('K6','bucket_6'), ('K7','bucket_7'), ('K8','bucket_8'),
        |    ('K9','bucket_9')) AS t(k, k_name)),
        |fact AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 'K0'
        |              ELSE 'K' || (l_orderkey % 10) END AS k,
        |    l_quantity
        |  FROM lineitem)
        |SELECT k_name, count(1) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
        |FROM fact JOIN dim USING (k)
        |GROUP BY k_name
        |ORDER BY k_name ASC NULLS FIRST""".stripMargin,
    "join_dpp" ->
      """WITH dim AS (
        |  SELECT DISTINCT year(o_orderdate) AS ship_year FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 490000.0)
        |SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year, count(1) AS n_rows,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN dim ON year(l_shipdate) = dim.ship_year
        |GROUP BY 1 ORDER BY ship_year ASC NULLS FIRST""".stripMargin,
    "join_skew_salted" ->
      """WITH flags(flag, flag_name) AS (VALUES ('A', 'returned'), ('N', 'in_flight'), ('R', 'refused'))
        |SELECT flag_name, count(1) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN flags ON l_returnflag = flag
        |GROUP BY flag_name ORDER BY flag_name ASC NULLS FIRST""".stripMargin,
    "join_range_bucketed" ->
      """SELECT p.event_id AS p_id, count(1) AS n_close,
        |  floor(min(abs(p.value - c.value)) * 10000 + 0.5) / 10000 AS min_diff
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND abs(p.value - c.value) <= 5.0
        |GROUP BY p.event_id
        |ORDER BY p_id ASC NULLS FIRST""".stripMargin,
    "join_bloom_prefilter" ->
      """SELECT l_returnflag, count(1) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "join_bloom_native" ->
      """SELECT l_returnflag, count(1) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '2-HIGH'
        |GROUP BY l_returnflag ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "join_bucketed" ->
      """SELECT c_nationkey, count(1) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin)
}
