package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregation surface (SURVEY.md §2.B "Aggregation"; all ABSENT in the
  * reference — the reference delegates querying to DuckDB, README.md:20-40).
  *
  * Scale notes (100 TB):
  *  - Every `groupBy().agg()` here compiles to partial (map-side) +
  *    final HashAggregateExec — one shuffle keyed on the group columns,
  *    with map-side combine shrinking shuffle volume to ~|groups| per task.
  *  - Group keys are low-cardinality (returnflag×linestatus = 6,
  *    status×priority = 15), so the shuffle payload is tiny regardless of
  *    input size; AQE coalesces the post-shuffle partitions.
  *  - Money sums use DECIMAL(18,2) accumulation: exact (no float summation
  *    order sensitivity across 1000 executors) and still codegen'd.
  *  - `agg_approx_distinct` uses HLL++ (approx_count_distinct) — the
  *    mergeable-sketch path a 100 TB COUNT DISTINCT needs; the exact
  *    `agg_distinct` demonstrates Spark's expand + two-phase plan.
  */
object Aggregates {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  /** Exact money arithmetic: cents-grid doubles -> DECIMAL so that the sum
    * is order-independent (deterministic vs the DuckDB oracle). */
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** TPC-H Q1 shape on lineitem — the flagship (SURVEY.md §7 M0). */
  def aggHash(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"),
        round(sum(dec("l_extendedprice")), 2).cast("double").as("sum_base_price"),
        round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))), 2)
          .cast("double").as("sum_disc_price"),
        // avg as exact-decimal sum / count: both engines then perform the
        // SAME IEEE divide + floor-round -> bit-identical (graft.Det).
        graft.Det.r2(sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        graft.Det.r2(sum(dec("l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        graft.Det.r2(sum(dec("l_discount")).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)

  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc)

  /** EXACT distinct counting through Spark 4's BITMAP aggregate family
    * (r12): ids hash to (bucket, bit-position), one fixed-width 4 KB
    * bitmap per (group, bucket) ORs map-side, bitmap_count pops the
    * bits, an outer sum folds buckets. Versus countDistinct's Expand
    * (row multiplication, per-value shuffle state) the shuffle carries
    * ≤ 4 KB per (group, bucket) regardless of how many distinct ids a
    * group holds — the exact-distinct shape that survives 100 TB user
    * tables; the two-level plan IS the documented Databricks/Spark
    * bitmap recipe. The oracle checks the COUNTS (bitmaps are an
    * engine-internal encoding; their cardinalities are exact). */
  def aggBitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("bitmap_events")
    spark.sql(
      """SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_users
        |FROM (
        |  SELECT event_type, bitmap_bucket_number(user_id) AS bkt,
        |    bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id))) AS cnt
        |  FROM bitmap_events
        |  GROUP BY event_type, bitmap_bucket_number(user_id))
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin)
  }

  /** PRE-AGGREGATED bitmap rollup (r12): the mergeable-cube pattern for
    * EXACT distinct — per-(site, group, bucket) bitmaps built
    * independently (here: even/odd event halves standing in for two
    * ingestion sites), persisted as BINARY cube cells, then merged with
    * `bitmap_or_agg` and popped. The point vs re-counting raw data:
    * the merge input is |sites|·|groups|·|buckets| fixed-width bitmaps
    * — a distinct-count cube refreshes by OR-ing cells, never
    * re-scanning events, and unlike HLL cubes (`agg_sketch_merge`) the
    * answer is EXACT. Oracle compares against count(DISTINCT) over the
    * union, which must agree bit-for-bit. */
  def aggBitmapMerge(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("bitmap_events2")
    spark.sql(
      """WITH cells AS (
        |  SELECT event_id % 2 AS site, event_type,
        |    bitmap_bucket_number(user_id) AS bkt,
        |    bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
        |  FROM bitmap_events2
        |  GROUP BY event_id % 2, event_type, bitmap_bucket_number(user_id)),
        |merged AS (
        |  SELECT event_type, bkt, bitmap_count(bitmap_or_agg(bm)) AS cnt
        |  FROM cells GROUP BY event_type, bkt)
        |SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_users
        |FROM merged
        |GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin)
  }

  private def hierSelect(df: DataFrame): DataFrame =
    df.select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("revenue"))
      .orderBy(col("status").asc, col("priority").asc)

  /** No natural NULLs exist in the grouping columns (FIXTURES.md §1), so
    * coalescing subtotal NULLs to "(all)" is unambiguous and keeps the
    * oracle comparison free of NULL-ordering pitfalls. */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    hierSelect(
      t(spark, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             round(sum(dec("o_totalprice")), 2).cast("double").as("revenue")))

  def aggCube(spark: SparkSession, dir: String): DataFrame =
    hierSelect(
      t(spark, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             round(sum(dec("o_totalprice")), 2).cast("double").as("revenue")))

  /** GROUPING SETS ((status), (priority)) via the Dataset API (Spark 4
    * `groupingSets`) — no temp views, only the orders schema is read. */
  def aggGsets(spark: SparkSession, dir: String): DataFrame =
    hierSelect(
      t(spark, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             round(sum(dec("o_totalprice")), 2).cast("double").as("revenue")))

  /** HLL++ sketch — mergeable, constant memory per group (the only COUNT
    * DISTINCT that scales to 100 TB). OperatorSpecs asserts the estimate
    * is within ±5% of the exact count (no DuckDB oracle: sketch
    * internals differ per engine). */
  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy(col("l_returnflag").asc)

  /** Exact percentiles (p50/p90/p99) per return flag — the sort-based
    * aggregate path (Percentile buffers per group). Oracle: DuckDB
    * quantile_cont uses the same linear interpolation; floor-rounding
    * absorbs last-bit IEEE differences. */
  def aggPercentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        graft.Det.r2(expr("percentile(l_extendedprice, 0.5D)")).as("p50"),
        graft.Det.r2(expr("percentile(l_extendedprice, 0.9D)")).as("p90"),
        graft.Det.r2(expr("percentile(l_extendedprice, 0.99D)")).as("p99"))
      .orderBy(col("l_returnflag").asc)

  /** Approximate percentiles — the mergeable-sketch path that replaces
    * exact percentile at 100 TB (constant memory per group, one shuffle
    * of sketches). No DuckDB oracle (sketch internals are engine-
    * specific); OperatorSpecs asserts closeness to the exact variant. */
  def aggApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_extendedprice"),
             array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("pcts"))
      .select(col("l_returnflag"),
        col("pcts")(0).as("p50"), col("pcts")(1).as("p90"), col("pcts")(2).as("p99"))
      .orderBy(col("l_returnflag").asc)

  /** Pivot (long→wide): per-priority counts spread over the three order
    * statuses. Explicit pivot values keep the plan single-pass at any
    * scale — no extra distinct-discovery job, and the column set is fixed
    * at plan time. */
  def aggPivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .orderBy(col("o_orderpriority").asc)

  /** TPC-H Q3 shape through the SQL FRONT-END (temp views + spark.sql) —
    * proves the whole surface is reachable from SQL text, not only the
    * DataFrame API; Catalyst plans both identically. */
  def sqlTpchQ3(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(
      """SELECT l_orderkey,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
        |  date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate  > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin)
  }

  /** TPC-H Q5 shape through the SQL front-end (r5): the six-table
    * local-supplier-volume star join — customer and supplier must sit in
    * the same nation, so the join graph has a cycle and the optimizer's
    * join reorder actually matters. region/nation broadcast (≤25 rows);
    * Catalyst plans the lineitem side as the streaming probe. Revenue is
    * the exact-DECIMAL sum rounded before the double cast. */
  def sqlTpchQ5(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS FIRST""".stripMargin)
  }

  /** TPC-H Q6 shape through the SQL front-end (r5): the pure
    * filter-and-sum "forecast revenue change" scan — the canonical
    * pushdown probe (every predicate reaches the parquet reader; the agg
    * is a single global DECIMAL sum, no groups, no shuffle beyond the
    * one-row partial merge). */
  def sqlTpchQ6(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        |  count(1) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 25""".stripMargin)
  }

  /** TPC-H Q14 shape through the SQL front-end (r5): promo revenue share
    * — join + conditional aggregation producing one ratio. The division
    * runs on exact DECIMAL sums cast to double, then floor-rounds
    * (graft.Det): bit-identical in both engines. */
  def sqlTpchQ14(spark: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part").foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(
      """SELECT
        |  floor(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    * 10000 + 0.5) / 10000 AS promo_share_pct,
        |  count(1) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate <  TIMESTAMP '1996-04-01'""".stripMargin)
  }

  /** TPC-H Q10 shape through the SQL front-end (r5): returned-item
    * revenue per customer — a 4-table star join whose top-20 cut runs as
    * TakeOrderedAndProject (k rows per partition to the driver merge,
    * never a global sort). nation broadcasts (25 rows); customer joins
    * orders pre-filtered by the date window, so the shuffled side shrinks
    * before the lineitem probe. Revenue is the exact-DECIMAL sum rounded
    * before the double cast; the explicit c_custkey tiebreak makes the
    * LIMIT deterministic. */
  def sqlTpchQ10(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(Q10Sql)
  }

  private val Q10Sql =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-07-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS FIRST
      |LIMIT 20""".stripMargin

  /** TPC-H Q18 shape through the SQL front-end (r5): large-volume orders
    * — the IN-subquery path. Catalyst rewrites the uncorrelated IN into a
    * left-semi join on the aggregated subquery (RewritePredicateSubquery),
    * so the "subquery" costs one map-side-combined agg + one semi join,
    * not a per-row probe. Quantity sums are exact DECIMAL on both sides
    * of the threshold, so the survivor set is engine-independent. */
  def sqlTpchQ18(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(Q18Sql)
  }

  private val Q18Sql =
    """SELECT c_custkey, c_name, o_orderkey,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
      |GROUP BY c_custkey, c_name, o_orderkey
      |ORDER BY total_qty DESC NULLS LAST, o_orderkey ASC NULLS FIRST
      |LIMIT 20""".stripMargin

  /** TPC-H Q7 shape through the SQL front-end (r6): cross-nation shipping
    * volume — a 6-table snowflake where the interesting predicate is the
    * symmetric two-nation DISJUNCTION over the two nation dims. Both
    * nation joins broadcast (25 rows each); the disjunction can't be
    * pushed into either scan, so it runs as a post-join filter before the
    * (supp_nation, cust_nation, year) rollup — exactly how the real Q7
    * plans. Revenue is the exact-decimal sum rounded pre-double. */
  def sqlTpchQ7(spark: SparkSession, dir: String): DataFrame = {
    Seq("supplier", "lineitem", "orders", "customer", "nation")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(Q7Sql)
  }

  private val Q7Sql =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(round(sum(volume), 2) AS DOUBLE) AS revenue,
      |  count(1) AS n_rows
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation ASC NULLS FIRST, cust_nation ASC NULLS FIRST,
      |  l_year ASC NULLS FIRST""".stripMargin

  /** TPC-H Q8 shape through the SQL front-end (r6): national market share
    * — the deepest join in the suite (7 tables, nation joined TWICE under
    * different roles), with the share computed as a conditional sum over
    * the full sum. Exact decimal sums on both sides; the division runs in
    * double and grid-snaps, so 1000-executor summation order can't move
    * the digits. Region/part predicates prune before the fact probe. */
  def sqlTpchQ8(spark: SparkSession, dir: String): DataFrame = {
    Seq("part", "supplier", "lineitem", "orders", "customer", "nation", "region")
      .foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(Q8Sql)
  }

  private val Q8Sql =
    """SELECT o_year,
      |  floor(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
      |                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(sum(volume) AS DOUBLE) * 10000 + 0.5) / 10000 AS mkt_share,
      |  count(1) AS n_rows
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume,
      |    n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem  ON p_partkey = l_partkey
      |  JOIN supplier  ON s_suppkey = l_suppkey
      |  JOIN orders    ON l_orderkey = o_orderkey
      |  JOIN customer  ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region    ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
      |) all_nations
      |GROUP BY o_year
      |ORDER BY o_year ASC NULLS FIRST""".stripMargin

  /** TPC-H Q19 shape through the SQL front-end (r6): the discounted
    * revenue of three DISJUNCTIVE (brand, size-window, quantity-window)
    * baskets — the classic OR-of-ANDs predicate. Catalyst extracts the
    * common `p_partkey = l_partkey` equi-condition so the join stays a
    * hash join with the disjunction as a residual filter (a naive engine
    * degrades to a nested loop here); the p_brand IN superset-filter is
    * pushed into the part scan. (The corpus carries no
    * shipmode/shipinstruct — the conjuncts use its real columns.) */
  def sqlTpchQ19(spark: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "part").foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(Q19Sql)
  }

  private val Q19Sql =
    """SELECT
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
      |  count(1) AS n_rows
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 5 AND 25
      |       AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#25' AND p_size BETWEEN 15 AND 40
      |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  /** Recursive CTE through the SQL front-end (r6): Spark 4's
    * `WITH RECURSIVE` (UnionLoop execution) on a deterministic doubling
    * chain seeded from the 5 lowest customer keys — anchor + recursive
    * step + fixpoint, the SQL-standard form of the iterative driver loop
    * `dedup_cluster` hand-rolls. The per-root rollup joins the expanded
    * closure back to `customer` to count which synthetic nodes hit real
    * keys. Bounded: each chain is ~11 levels (k < 1500), so the loop
    * materializes ~55 rows total — recursion depth scales with log of
    * the bound, not table size. */
  def sqlRecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(RecursiveCteSql)
  }

  private val RecursiveCteSql =
    """WITH RECURSIVE chain(root, k, depth) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 5
      |  UNION ALL
      |  SELECT root, k * 2 + 1, depth + 1 FROM chain WHERE k * 2 + 1 < 1500
      |)
      |SELECT root, count(1) AS n_nodes, max(depth) AS max_depth,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  count(c_custkey) AS n_real_customers
      |FROM chain LEFT JOIN customer ON k = c_custkey
      |GROUP BY root
      |ORDER BY root ASC NULLS FIRST""".stripMargin

  /** grouping()/grouping_id() over a cube (r6): the disambiguation
    * functions every cube/rollup CONSUMER needs — a NULL group key is
    * ambiguous ("the NULL value" vs "this key is rolled up") and
    * grouping() is the only portable way to tell them apart; the composite
    * grouping id is computed as 2·g(a)+g(b) portably (engine-native
    * grouping_id() bit orders differ). Same Expand-based plan as
    * `agg_cube`, one extra projected column. */
  def aggGroupingId(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping(col("o_orderpriority")).cast("int").as("g_pri"),
           grouping(col("o_orderstatus")).cast("int").as("g_st"),
           (grouping(col("o_orderpriority")).cast("int") * 2 +
             grouping(col("o_orderstatus")).cast("int")).as("gid"),
           count(lit(1)).as("n"))
      .orderBy(col("gid").asc, col("o_orderpriority").asc_nulls_first,
               col("o_orderstatus").asc_nulls_first)

  /** TPC-H Q13 shape through the SQL front-end (r6): the customer order-
    * count DISTRIBUTION — the double-aggregation idiom (aggregate, then
    * aggregate the aggregate) over a LEFT join that must keep zero-order
    * customers (count(o_orderkey) counts non-NULLs, so the preserved rows
    * land in the c_count=0 bucket; an inner join would silently drop the
    * most interesting bar of the histogram). The join-side predicate
    * stands in for Q13's NOT LIKE comment filter: it must live in the ON
    * clause — as a WHERE it would turn the outer join back into inner. */
  def sqlTpchQ13(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(Q13Sql)
  }

  private val Q13Sql =
    """SELECT c_count, count(1) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin

  /** TPC-H Q22 shape through the SQL front-end (r6): rich customers who
    * never ordered — an uncorrelated scalar-subquery threshold (computed
    * once, broadcast as a literal; division avoided by cross-multiplying
    * exact sums, the `sql_scalar_subquery` device) combined with an
    * anti-join (`NOT EXISTS` → left-anti). The corpus has no phone
    * country codes, so the rollup keys on nationkey mod 5, and "never
    * ordered" is scoped to the trailing year (every customer has SOME
    * order in this corpus — Q22's 7-year-inactive analog). */
  def sqlTpchQ22(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(Q22Sql)
  }

  private val Q22Sql =
    """SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntry,
      |  count(1) AS numcust,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal * (SELECT count(1) FROM customer WHERE c_acctbal > 0.0) >
      |  (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-06-01')
      |GROUP BY cntry
      |ORDER BY cntry ASC NULLS FIRST""".stripMargin

  /** TPC-H Q1 through the SQL front-end (r6): THE canonical pricing
    * summary — completes the corpus-expressible TPC-H set (13 of 22;
    * the other nine need partsupp/shipmode columns the corpus lacks).
    * All sums exact DECIMAL (the two-factor and three-factor products
    * widen to DECIMAL(38,6) identically in both engines) rounded before
    * the double cast; averages computed from exact sums and the BIGINT
    * count in double, grid-snapped — never engine `avg()`, whose
    * internal accumulator type differs. One map-side-combined agg,
    * 4 groups out at any scale. */
  def sqlTpchQ1(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(Q1Sql)
  }

  private val Q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |    * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
      |  floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    / count(1) * 10000 + 0.5) / 10000 AS avg_qty,
      |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    / count(1) * 10000 + 0.5) / 10000 AS avg_price,
      |  floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
      |    / count(1) * 10000 + 0.5) / 10000 AS avg_disc,
      |  count(1) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** LATERAL correlated subquery in FROM (r6): per-order top-2 lineitems
    * — "for each row, run this parameterized subquery" as SQL-standard
    * syntax. Catalyst decorrelates the LIMIT-bearing lateral into a rank
    * window over one join (DecorrelateInnerQuery), so the per-row
    * subquery costs one shuffle, not |orders| probes — the same plan
    * `topk_per_group` builds by hand. */
  def sqlLateralJoin(spark: SparkSession, dir: String): DataFrame = {
    Seq("orders", "lineitem").foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(LateralSql)
  }

  private val LateralSql =
    """SELECT o_orderkey, l.l_linenumber, l.l_quantity
      |FROM orders o,
      |LATERAL (SELECT l_linenumber, l_quantity FROM lineitem
      |         WHERE l_orderkey = o.o_orderkey
      |         ORDER BY l_quantity DESC, l_linenumber ASC LIMIT 2) l
      |WHERE o_orderkey % 100 = 0
      |ORDER BY o_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
      |  l_quantity DESC NULLS LAST""".stripMargin

  /** Pairwise correlation matrix (r5): all three correlations among
    * (quantity, price, discount) from ONE pass of exact decimal sums —
    * the feature-screening matrix, computed the `agg_stats` way
    * (order-independent BIGINT-exact partials, one map-side-combined
    * agg; the double formula runs identically in both engines only on
    * the final 10 scalars). At 100 TB: one scan, one 1-row shuffle —
    * never the k-pass or row-pair forms. */
  def aggCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val q = dec("l_quantity")
    val p = dec("l_extendedprice")
    val dd = dec("l_discount")
    def d(c: String) = col(c).cast("double")
    import org.apache.spark.sql.Column
    def corr(n: Column, sx: Column, sy: Column, sxx: Column, syy: Column, sxy: Column) =
      graft.Det.r4((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
    t(spark, dir, "lineitem")
      .agg(count(lit(1)).as("n"),
           sum(q).as("sq"), sum(p).as("sp"), sum(dd).as("sd"),
           sum((q * q).cast("decimal(38,4)")).as("sqq"),
           sum((p * p).cast("decimal(38,4)")).as("spp"),
           sum((dd * dd).cast("decimal(38,4)")).as("sdd"),
           sum((q * p).cast("decimal(38,4)")).as("sqp"),
           sum((q * dd).cast("decimal(38,4)")).as("sqd"),
           sum((p * dd).cast("decimal(38,4)")).as("spd"))
      .select(col("n"),
        corr(d("n"), d("sq"), d("sp"), d("sqq"), d("spp"), d("sqp")).as("corr_qty_price"),
        corr(d("n"), d("sq"), d("sd"), d("sqq"), d("sdd"), d("sqd")).as("corr_qty_disc"),
        corr(d("n"), d("sp"), d("sd"), d("spp"), d("sdd"), d("spd")).as("corr_price_disc"))
  }

  /** Boolean/conditional aggregate family (r5): count_if + bool_and +
    * bool_or — the assertion aggregates (data-quality checks, flag
    * rollups) in their native form instead of sum(CASE…). All algebraic,
    * map-side combined, |groups| rows shuffled. */
  def aggBool(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count_if(col("o_totalprice") > 100000).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_orderstatus") === "P").as("any_pending"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc)

  /** TPC-H Q4 analog through the SQL front-end (r5): a CORRELATED EXISTS
    * — late-shipping orders per priority, where the subquery references
    * the outer row's o_orderkey AND o_orderdate. Catalyst decorrelates
    * it (RewritePredicateSubquery → left-semi join with the correlated
    * predicate as the join condition), so "run the subquery per row"
    * costs one semi join. The reference corpus has no
    * commitdate/receiptdate, so lateness is shipdate > orderdate + 90d —
    * same plan shape as the real Q4. */
  def sqlTpchQ4(spark: SparkSession, dir: String): DataFrame = {
    Seq("orders", "lineitem").foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(Q4Sql)
  }

  private val Q4Sql =
    """SELECT o_orderpriority, count(1) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Uncorrelated scalar subqueries through the SQL front-end (r5):
    * orders priced 50% above the corpus average — both scalar subqueries
    * compute once and broadcast as literals into the filter. Division is
    * avoided (engine-specific decimal-avg types): the comparison is
    * cross-multiplied so each side is one exact-decimal aggregate cast
    * to double, identical in both engines. */
  def sqlScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(ScalarSubSql)
  }

  private val ScalarSubSql =
    """SELECT o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM orders
      |WHERE o_totalprice * (SELECT count(1) FROM orders) >
      |  CAST(1.5 AS DOUBLE) *
      |    (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders)
      |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin

  /** Deterministic argmax/argmin (r5): which order carries the highest
    * (and lowest) total price per priority — `max_by`/`min_by` with a
    * COMPOSITE (value, key) ordering struct: bare max_by ties are
    * engine-nondeterministic, the composite makes the selection a total
    * order. One map-side-combined hash agg; the equivalent window form
    * pays a full per-group sort for the same single row. */
  def aggArgmax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        max_by(col("o_orderkey"),
               struct(col("o_totalprice"), col("o_orderkey"))).as("max_price_order"),
        min_by(col("o_orderkey"),
               struct(col("o_totalprice"), col("o_orderkey"))).as("min_price_order"),
        round(max(dec("o_totalprice")), 2).cast("double").as("max_price"),
        round(min(dec("o_totalprice")), 2).cast("double").as("min_price"))
      .orderBy(col("o_orderpriority").asc)

  /** collect_set drives ObjectHashAggregate (with sort-based fallback under
    * memory pressure) — the non-codegen agg path; output is a sorted,
    * comma-joined string so the oracle hash-matches. */
  def aggSortFallback(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority").asc)

  /** Second-moment statistics (stddev, correlation) per group, computed
    * from EXACT decimal sums (n, Σx, Σy, Σxx, Σyy, Σxy) and only then
    * combined in double arithmetic — the same formula the oracle runs, so
    * results are bit-deterministic regardless of summation order across
    * 1000 executors. This is also the right SCALE shape: the six sums are
    * one map-side-combined hash agg (mergeable partials), unlike a naive
    * two-pass mean-then-deviation which would scan the data twice. */
  def aggStats(spark: SparkSession, dir: String): DataFrame = {
    val x = dec("l_quantity")
    val y = dec("l_extendedprice")
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(x).as("sx_d"), sum(y).as("sy_d"),
           sum((x * x).cast("decimal(38,4)")).as("sxx_d"),
           sum((y * y).cast("decimal(38,4)")).as("syy_d"),
           sum((x * y).cast("decimal(38,4)")).as("sxy_d"))
      .select(col("l_returnflag"), col("n"),
        graft.Det.r4(sqrt((d("sxx_d") - d("sx_d") * d("sx_d") / n) / (n - 1))).as("std_qty"),
        graft.Det.r4(sqrt((d("syy_d") - d("sy_d") * d("sy_d") / n) / (n - 1))).as("std_price"),
        graft.Det.r4((n * d("sxy_d") - d("sx_d") * d("sy_d")) /
          (sqrt(n * d("sxx_d") - d("sx_d") * d("sx_d")) *
           sqrt(n * d("syy_d") - d("sy_d") * d("sy_d")))).as("corr_qty_price"))
      .orderBy(col("l_returnflag").asc)
  }

  /** Mergeable-sketch COUNT DISTINCT — the actual 100 TB architecture:
    * each "site" (modeled as the even/odd orderkey halves) builds compact
    * Datasketches HLL sketches independently; only the ~KB sketches move
    * to the final union+estimate. Unlike `agg_approx_distinct` (one-shot
    * estimate), this exercises sketch MERGEABILITY — sketches built on
    * disjoint data at different times/places combine losslessly, which is
    * what makes pre-aggregated distinct-count cubes possible. Estimate
    * accuracy is pinned by OperatorSpecs (no oracle: engine-specific
    * sketch). */
  def aggSketchMerge(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    def site(m: Int) = li
      .filter(pmod(col("l_orderkey"), lit(2)) === m)
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    site(0).unionByName(site(1))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_parts"))
      .orderBy(col("l_returnflag").asc)
  }

  /** Mergeable COUNT-MIN sketches — the frequency-estimate counterpart
    * of `agg_sketch_merge`'s HLL distinct counts, and since r7 a fully
    * IN-PLAN pipeline on the native `graft.functions.CountMin` family
    * (TypedImperativeAggregate — the `percentile`/`collect_list` tier;
    * r6 merged the sketches driver-side via two `.collect()`s): each
    * "site" (even/odd orderkey half) builds a compact CMS independently
    * (`count_min`), the per-site sketches roll up in a second aggregate
    * (`count_min_merge` — only ~KB sketches move, never rows), and the
    * 1-row merged sketch broadcasts against the exact counts where the
    * scalar `count_min_estimate` probes it. One-sided error: CMS only
    * ever over-counts, by ≤ ε·N at the chosen confidence; fixed seed →
    * deterministic. The spec (not an oracle — engine sketch) pins the
    * bound and the SQL registration. */
  def aggCountMin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CountMin.{count_min, count_min_estimate, count_min_merge}
    val orders = t(spark, dir, "orders")
    val perSite = orders
      .groupBy(pmod(col("o_orderkey"), lit(2)).as("site"))
      .agg(count_min(col("o_orderpriority"), 0.001, 0.99, 42).as("sk"))
    val merged = perSite.agg(count_min_merge(col("sk")).as("sk")) // 1 row
    val total = orders.agg(count(lit(1)).as("n_total"))           // 1 row
    orders.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(merged))
      .crossJoin(broadcast(total))
      .withColumn("n_est", count_min_estimate(col("sk"), col("o_orderpriority")))
      .withColumn("within_bound",
        col("n_est") >= col("n_exact") &&
          col("n_est") <= col("n_exact") + ceil(col("n_total") * 0.001).cast("long"))
      .select(col("o_orderpriority"), col("n_exact"), col("n_est"), col("within_bound"))
      .orderBy(col("o_orderpriority").asc)
  }

  /** Fixed-width value histogram (r4): bin = floor(value / 10) — one
    * map-side-combined hash agg, |bins| rows shuffled at any input size;
    * binning in the SAME IEEE division both engines evaluate keeps the
    * bucket edges bit-identical (no engine-specific width_bucket). The
    * distinct-user count per bin rides the same shuffle. */
  def aggHistogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(floor(col("value") / 10).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
           countDistinct(col("user_id")).as("n_users"),
           min(col("value")).as("lo"),
           max(col("value")).as("hi"))
      .orderBy(col("bin").asc_nulls_first)

  /** Wide→long unpivot/melt (r4) — the inverse of `agg_pivot`: a wide
    * per-flag metrics frame melted to (flag, metric, value) rows. Spark's
    * native `unpivot` is a Generate-style expansion, no shuffle beyond
    * the feeding agg; the metric list is fixed at plan time (like the
    * pivot value list), so the schema is static at any scale. */
  def aggUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"),
           round(sum(dec("l_extendedprice")), 2).cast("double").as("sum_price"),
           round(sum(dec("l_discount")), 2).cast("double").as("sum_disc"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy(col("l_returnflag").asc, col("metric").asc)
  }

  /** Deterministic per-group mode (r4): most frequent status per priority,
    * ties broken by value — engine-native `mode()` functions have
    * engine-specific tie behavior, so the portable form is count + window
    * rank with an explicit tiebreak. Two shuffles: the count agg
    * (map-side combined) and the rank window over |groups × values| tiny
    * rows, never over the input. */
  def aggMode(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cnt").desc, col("o_orderstatus").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderpriority"), col("o_orderstatus").as("mode_status"), col("cnt"))
      .orderBy(col("o_orderpriority").asc)
  }

  /** Skew-safe two-phase aggregation (r5): phase 1 groups on
    * (key, salt = hash(row-unique cols) mod 16) so a pathologically hot
    * key's rows spread over 16 reducers instead of melting one; phase 2
    * re-aggregates the ≤16 partials per key. For algebraic aggregates
    * (sum/count here) the result is identical to the direct groupBy —
    * which is the oracle. Map-side combine already does most of this for
    * hash aggs; the explicit salt is the pattern for the cases it can't
    * cover (sort-fallback aggs, collect-style buffers, extreme skew where
    * one key exceeds a single task's memory). Shuffle 1 carries
    * |keys|·16 partial rows, shuffle 2 carries |keys|·16 → |keys|. */
  def aggSkewTwophase(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val partial = li
      .groupBy(col("l_returnflag"),
               pmod(hash(col("l_orderkey"), col("l_partkey"), col("l_linenumber")), lit(16)).as("salt"))
      .agg(sum(dec("l_quantity")).as("p_qty"),
           sum(dec("l_extendedprice")).as("p_price"),
           count(lit(1)).as("p_n"))
    partial
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("p_qty")), 2).cast("double").as("sum_qty"),
           round(sum(col("p_price")), 2).cast("double").as("sum_price"),
           sum(col("p_n")).as("n_rows"))
      .orderBy(col("l_returnflag").asc)
  }

  /** Ordered string aggregation (r7) — LISTAGG semantics made
    * deterministic: `array_join(array_sort(collect_set(x)))` gives the
    * sorted-distinct concatenation regardless of row arrival order, so
    * it shuffles |distinct| values per group and never depends on task
    * scheduling (raw LISTAGG without WITHIN GROUP ordering is
    * nondeterministic by definition — the one SQL aggregate you cannot
    * let arrive unordered at 1000 executors). */
  def aggListagg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
           countDistinct(col("l_linestatus")).as("n_status"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc)

  /** Linear-regression aggregate family (r7): regr_slope / regr_intercept
    * / regr_r2 / regr_count of extendedprice on quantity per returnflag —
    * single-pass algebraic moments (sum, sum², cross-sum), so they
    * map-side combine like any sum; 4-dp floor-rounding on both sides
    * because the final divisions are doubles. */
  def aggRegr(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(graft.Det.r4(regr_slope(col("y"), col("x"))).as("slope"),
           graft.Det.r4(regr_intercept(col("y"), col("x"))).as("intercept"),
           graft.Det.r4(regr_r2(col("y"), col("x"))).as("r2"),
           regr_count(col("y"), col("x")).cast("long").as("n"))
      .orderBy(col("l_returnflag").asc)

  /** Discrete percentiles (r7): `percentile_disc` RETURNS AN ACTUAL
    * ELEMENT of the group (the smallest value at-or-above the cume_dist
    * cutoff), so unlike the interpolating percentile the output is exact
    * — no float synthesis, no rounding, hash-stable across engines. */
  def aggPercentileDisc(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS q25,
        |  CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS q50,
        |  CAST(percentile_disc(0.9)  WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS q90
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin)
  }

  /** Bitwise aggregates (r7): bit_and / bit_or / bit_xor over the event id
    * space per type — algebraic, order-independent, exact; the xor
    * doubles as a cheap set-membership checksum (xor of ids is invariant
    * under reordering and re-sharding, a classic reconciliation trick for
    * comparing two 100 TB copies without sorting either). */
  def aggBitOps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr("bit_and(event_id)").as("ids_and"),
           expr("bit_or(event_id)").as("ids_or"),
           expr("bit_xor(event_id)").as("ids_xor"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type").asc_nulls_first)

  /** Weighted average (r7): quantity-weighted mean price per flag — both
    * sums in EXACT decimal (order-independent, map-side combined), the
    * one IEEE division at the very end, floor-rounded: the numerically
    * honest form of every "weighted mean over 10^12 rows" aggregate
    * (a running float mean accumulates error and depends on partial
    * ordering; two exact sums don't). */
  def aggWeightedAvg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(graft.Det.r4(
             sum(dec("l_extendedprice") * dec("l_quantity")).cast("double") /
             sum(dec("l_quantity")).cast("double")).as("wavg_price"),
           sum(dec("l_quantity")).cast("double").as("total_weight"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc)

  /** GROUP BY ALL (r7) — groups on every non-aggregate select item; the
    * resolver expands it before optimization, so the plan is identical to
    * the explicit form (one hash agg). */
  def sqlGroupByAll(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, count(1) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ALL
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** Robust location/spread (r7): exact `median` plus MAD (median
    * absolute deviation) per group — the outlier-resistant pair a data-
    * quality screen prefers over mean/stddev (one corrupt 1e9 row drags
    * a mean arbitrarily far; the median moves one rank). Selection-based,
    * so no float-summation order sensitivity: Spark lacks a mad()
    * aggregate, so it's two exact-median passes — group medians broadcast
    * back (KB-sized), then the median of |x − med|. Both passes are sort-
    * aggregates over the same event_type shuffle key. */
  def aggMedianMad(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(median(col("value")).as("med0"), count(lit(1)).as("n"))
    ev.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("med0")).as("m"), first(col("n")).as("n0"),
           median(abs(col("value") - col("med0"))).as("mad0"))
      .select(col("event_type"), graft.Det.r4(col("m")).as("med"),
              graft.Det.r4(col("mad0")).as("mad"), col("n0").as("n"))
      .orderBy(col("event_type").asc)
  }

  /** approx_top_k (r7): Spark 4.1's DataSketches frequent-items aggregate.
    * Sketch guarantee: with maxItemsTracked ≥ the distinct count the
    * sketch never evicts, so the "approximate" counts are EXACT — which
    * is what makes this oracle-checkable (same argument as the CMS
    * under-capacity spec). At real cardinalities the same query degrades
    * gracefully to ±n/maxItemsTracked error, mergeable across partitions
    * — the shuffle carries one KB-scale sketch per partition, not the
    * keyspace (the engine-native tier of agg_heavy_hitters' Misra-Gries). */
  def aggApproxTopk(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(
      """SELECT s.col.item AS event_type, CAST(s.col.count AS BIGINT) AS n
        |FROM (SELECT explode(approx_top_k(event_type, 3, 100)) AS col
        |      FROM events) s
        |ORDER BY n DESC, event_type ASC NULLS FIRST""".stripMargin)
  }

  /** SQL PIVOT clause (r7) — the syntax surface over the same plan as
    * `agg_pivot`'s DataFrame form: the resolver rewrites PIVOT to a
    * conditional-aggregate groupBy, so it's one hash-agg shuffle (which
    * is exactly what the oracle writes out longhand — Spark-side coalesce
    * because PIVOT yields NULL for an absent (group, value) pair where
    * the longhand count yields 0). */
  def sqlPivotSyntax(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderpriority,
        |  CAST(coalesce(st_o, 0) AS BIGINT) AS n_open,
        |  CAST(coalesce(st_f, 0) AS BIGINT) AS n_finished,
        |  CAST(coalesce(st_p, 0) AS BIGINT) AS n_pending
        |FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
        |PIVOT (count(1) FOR o_orderstatus IN ('O' AS st_o, 'F' AS st_f, 'P' AS st_p))
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Per-aggregate FILTER clause (r14) — the SQL:2003 form of
    * conditional aggregation: independent predicates per aggregate in
    * ONE map-side-combined pass, where the CASE-WHEN spelling needs the
    * same plan but reads worse and the self-join spelling pays N scans. */
  def aggFilterClause(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(FilterClauseSql)
  }

  private val FilterClauseSql =
    """SELECT o_orderpriority,
      |  count(*) AS n,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      |  count(*) FILTER (WHERE o_orderkey % 2 = 0) AS n_even,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_finished
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Correlated EXISTS / NOT EXISTS subqueries (r14): both rewrite to
    * semi/anti joins under the hood — the declarative spelling of the
    * "customers with big orders but no failed ones" shape; one scan per
    * subquery, never a per-row loop. */
  def sqlExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("customer")
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(ExistsSubSql)
  }

  private val ExistsSubSql =
    """SELECT c_nationkey, count(1) AS n_cust
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F'
      |                    AND o2.o_totalprice < 50000)
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin

  /** GROUP BY ordinals + ORDER BY ALL (r14) — the DuckDB-popularized
    * shorthand Spark 4 ships: positions resolve against the select
    * list, ORDER BY ALL totals-orders every output column. */
  def sqlOrderByAll(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(OrderByAllSql)
  }

  private val OrderByAllSql =
    """SELECT o_orderpriority, o_orderstatus, count(1) AS n
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY ALL""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_pivot_syntax" -> (sqlPivotSyntax _),
    "agg_approx_topk" -> (aggApproxTopk _),
    "agg_median_mad" -> (aggMedianMad _),
    "agg_listagg" -> (aggListagg _),
    "agg_regr" -> (aggRegr _),
    "agg_percentile_disc" -> (aggPercentileDisc _),
    "agg_bit_ops" -> (aggBitOps _),
    "agg_weighted_avg" -> (aggWeightedAvg _),
    "sql_group_by_all" -> (sqlGroupByAll _),
    "agg_skew_twophase" -> (aggSkewTwophase _),
    "agg_unpivot" -> (aggUnpivot _),
    "agg_mode" -> (aggMode _),
    "agg_histogram" -> (aggHistogram _),
    "agg_sketch_merge" -> (aggSketchMerge _),
    "agg_count_min" -> (aggCountMin _),
    "agg_stats" -> (aggStats _),
    "agg_hash" -> (aggHash _),
    "agg_distinct" -> (aggDistinct _),
    "agg_bitmap_distinct" -> (aggBitmapDistinct _),
    "agg_bitmap_merge" -> (aggBitmapMerge _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_gsets" -> (aggGsets _),
    "agg_approx_distinct" -> (aggApproxDistinct _),
    "agg_percentile" -> (aggPercentile _),
    "agg_approx_percentile" -> (aggApproxPercentile _),
    "agg_pivot" -> (aggPivot _),
    "sql_tpch_q1" -> (sqlTpchQ1 _),
    "sql_tpch_q3" -> (sqlTpchQ3 _),
    "sql_tpch_q5" -> (sqlTpchQ5 _),
    "sql_tpch_q6" -> (sqlTpchQ6 _),
    "sql_tpch_q14" -> (sqlTpchQ14 _),
    "sql_tpch_q10" -> (sqlTpchQ10 _),
    "sql_tpch_q18" -> (sqlTpchQ18 _),
    "agg_argmax" -> (aggArgmax _),
    "agg_grouping_id" -> (aggGroupingId _),
    "agg_bool" -> (aggBool _),
    "agg_corr_matrix" -> (aggCorrMatrix _),
    "sql_tpch_q4" -> (sqlTpchQ4 _),
    "sql_tpch_q7" -> (sqlTpchQ7 _),
    "sql_tpch_q8" -> (sqlTpchQ8 _),
    "sql_tpch_q13" -> (sqlTpchQ13 _),
    "sql_tpch_q19" -> (sqlTpchQ19 _),
    "sql_tpch_q22" -> (sqlTpchQ22 _),
    "sql_recursive_cte" -> (sqlRecursiveCte _),
    "sql_lateral_join" -> (sqlLateralJoin _),
    "sql_scalar_subquery" -> (sqlScalarSubquery _),
    "agg_sort_fallback" -> (aggSortFallback _),
    "agg_filter_clause" -> (aggFilterClause _),
    "sql_exists_subquery" -> (sqlExistsSubquery _),
    "sql_order_by_all" -> (sqlOrderByAll _))

  val oracle: Map[String, String] = Map(
    "sql_pivot_syntax" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_approx_topk" ->
      """SELECT event_type, count(1) AS n FROM events
        |GROUP BY event_type
        |ORDER BY n DESC, event_type ASC NULLS FIRST
        |LIMIT 3""".stripMargin,
    "agg_median_mad" ->
      """SELECT event_type,
        |  floor(median(value) * 10000 + 0.5) / 10000 AS med,
        |  floor(mad(value) * 10000 + 0.5) / 10000 AS mad,
        |  count(1) AS n
        |FROM events GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "agg_listagg" ->
      """SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        |  count(DISTINCT l_linestatus) AS n_status, count(1) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "agg_regr" ->
      """SELECT l_returnflag,
        |  floor(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) * 10000 + 0.5) / 10000 AS slope,
        |  floor(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) * 10000 + 0.5) / 10000 AS intercept,
        |  floor(regr_r2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) * 10000 + 0.5) / 10000 AS r2,
        |  CAST(regr_count(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "agg_percentile_disc" ->
      """SELECT l_returnflag,
        |  CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.25) AS BIGINT) AS q25,
        |  CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.5)  AS BIGINT) AS q50,
        |  CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.9)  AS BIGINT) AS q90
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "agg_weighted_avg" ->
      """SELECT l_returnflag,
        |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 10000 + 0.5) / 10000 AS wavg_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_weight,
        |  count(1) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "agg_bit_ops" ->
      """SELECT event_type,
        |  bit_and(event_id) AS ids_and, bit_or(event_id) AS ids_or,
        |  bit_xor(event_id) AS ids_xor, count(1) AS n
        |FROM events GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "sql_group_by_all" ->
      """SELECT l_returnflag, l_linestatus, count(1) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ALL
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "sql_tpch_q10" -> Q10Sql,
    "sql_tpch_q18" -> Q18Sql,
    "sql_tpch_q4" -> Q4Sql,
    "sql_tpch_q1" -> Q1Sql,
    "sql_tpch_q7" -> Q7Sql,
    "sql_tpch_q8" -> Q8Sql,
    "sql_tpch_q13" -> Q13Sql,
    "sql_tpch_q19" -> Q19Sql,
    "sql_tpch_q22" -> Q22Sql,
    "sql_recursive_cte" -> RecursiveCteSql,
    "sql_lateral_join" -> LateralSql,
    "sql_scalar_subquery" -> ScalarSubSql,
    "agg_filter_clause" -> FilterClauseSql,
    "sql_exists_subquery" -> ExistsSubSql,
    "sql_order_by_all" ->
      """SELECT o_orderpriority, o_orderstatus, count(1) AS n
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY ALL NULLS FIRST""".stripMargin,
    "agg_corr_matrix" ->
      """WITH s AS (
        |  SELECT count(1) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sd,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sqq,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS spp,
        |    CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sdd,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sqp,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sqd,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS spd
        |  FROM lineitem)
        |SELECT n,
        |  floor((CAST(n AS DOUBLE) * sqp - sq * sp) /
        |    (sqrt(CAST(n AS DOUBLE) * sqq - sq * sq) * sqrt(CAST(n AS DOUBLE) * spp - sp * sp)) * 10000 + 0.5) / 10000 AS corr_qty_price,
        |  floor((CAST(n AS DOUBLE) * sqd - sq * sd) /
        |    (sqrt(CAST(n AS DOUBLE) * sqq - sq * sq) * sqrt(CAST(n AS DOUBLE) * sdd - sd * sd)) * 10000 + 0.5) / 10000 AS corr_qty_disc,
        |  floor((CAST(n AS DOUBLE) * spd - sp * sd) /
        |    (sqrt(CAST(n AS DOUBLE) * spp - sp * sp) * sqrt(CAST(n AS DOUBLE) * sdd - sd * sd)) * 10000 + 0.5) / 10000 AS corr_price_disc
        |FROM s""".stripMargin,
    "agg_grouping_id" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pri,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) * 2
        |    + CAST(GROUPING(o_orderstatus) AS INTEGER) AS gid,
        |  count(1) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY gid ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST""".stripMargin,
    "agg_bool" ->
      """SELECT o_orderpriority,
        |  count(1) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(o_orderstatus = 'P') AS any_pending,
        |  count(1) AS n
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_argmax" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rmax = 1 THEN o_orderkey END) AS max_price_order,
        |  max(CASE WHEN rmin = 1 THEN o_orderkey END) AS min_price_order,
        |  CAST(round(max(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS max_price,
        |  CAST(round(min(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS min_price
        |FROM r GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "sql_tpch_q6" ->
      """SELECT
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        |  count(1) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 25""".stripMargin,
    "sql_tpch_q14" ->
      """SELECT
        |  floor(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    * 10000 + 0.5) / 10000 AS promo_share_pct,
        |  count(1) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate <  TIMESTAMP '1996-04-01'""".stripMargin,
    "agg_skew_twophase" ->
      """SELECT l_returnflag,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
        |  count(1) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "agg_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
        |    CAST(round(sum(CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        |  UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w) u
        |ORDER BY l_returnflag ASC NULLS FIRST, metric ASC NULLS FIRST""".stripMargin,
    "agg_mode" ->
      """SELECT o_orderpriority, mode_status, cnt FROM (
        |  SELECT o_orderpriority, o_orderstatus AS mode_status, count(1) AS cnt,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY count(1) DESC NULLS LAST, o_orderstatus ASC NULLS FIRST) AS rn
        |  FROM orders GROUP BY o_orderpriority, o_orderstatus) t
        |WHERE rn = 1
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(value / 10) AS BIGINT) AS bin,
        |  count(1) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  min(value) AS lo,
        |  max(value) AS hi
        |FROM events GROUP BY 1
        |ORDER BY bin ASC NULLS FIRST""".stripMargin,
    "agg_stats" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(1) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  floor(sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) * 10000 + 0.5) / 10000 AS std_qty,
        |  floor(sqrt((syy - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) * 10000 + 0.5) / 10000 AS std_price,
        |  floor((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |        (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) * 10000 + 0.5) / 10000 AS corr_qty_price
        |FROM s ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(1) * 100 + 0.5) / 100 AS avg_qty,
        |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(1) * 100 + 0.5) / 100 AS avg_price,
        |  floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(1) * 100 + 0.5) / 100 AS avg_disc,
        |  count(1) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(1) AS n_orders
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,
    "agg_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "agg_bitmap_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "agg_rollup" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       count(1) AS n,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status ASC NULLS FIRST, priority ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       count(1) AS n,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status ASC NULLS FIRST, priority ASC NULLS FIRST""".stripMargin,
    "agg_gsets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       count(1) AS n,
        |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status ASC NULLS FIRST, priority ASC NULLS FIRST""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        |  floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.5) / 100 AS p50,
        |  floor(quantile_cont(l_extendedprice, 0.9) * 100 + 0.5) / 100 AS p90,
        |  floor(quantile_cont(l_extendedprice, 0.99) * 100 + 0.5) / 100 AS p99
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,
    "agg_pivot" ->
      """SELECT o_orderpriority,
        |  count(1) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        |  count(1) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        |  count(1) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin,
    "sql_tpch_q5" ->
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS FIRST""".stripMargin,
    "sql_tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate  > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "agg_sort_fallback" ->
      """SELECT o_orderpriority,
        |       (SELECT string_agg(s, ',' ORDER BY s)
        |          FROM (SELECT DISTINCT o_orderstatus AS s FROM orders o2
        |                 WHERE o2.o_orderpriority = o1.o_orderpriority) d) AS statuses,
        |       count(1) AS n
        |FROM orders o1 GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin)
}
