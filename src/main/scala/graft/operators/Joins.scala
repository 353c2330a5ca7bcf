package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Join surface (SURVEY.md §2.B "Joins" — all ABSENT in the reference).
  *
  * Scale notes (100 TB):
  *  - `join_inner` is hinted MERGE (shuffle sort-merge): the right shape
  *    when BOTH sides are large — each side shuffles once on the key and
  *    streams; no build-side OOM risk.
  *  - `join_broadcast` broadcasts the dimension chain (nation 25 rows,
  *    region 5): zero shuffle of the fact table, the only sane plan when
  *    one side fits in memory. AQE also auto-converts at runtime, but the
  *    explicit hint keeps the plan stable at any statistics quality.
  *  - `join_theta_range` is a non-equi join against a 3-row broadcast
  *    bands table -> BroadcastNestedLoopJoin where the inner side is tiny;
  *    at 100 TB the fact side still streams with no shuffle.
  *  - `join_asof` deliberately AVOIDS the naive range-join + dedup (which
  *    explodes to |purchases| x |prior clicks| before pruning). It is a
  *    single union + one window pass: shuffle each event once on user_id,
  *    carry the last click timestamp forward. O(n log n) per key,
  *    skew-bounded by events-per-user — the shape that survives 100 TB.
  */
object Joins {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Large⋈large: shuffle sort-merge join (hinted; see scale notes). */
  def joinInner(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer").hint("merge"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(dec("o_totalprice")), 2).cast("double").as("revenue"))
      .orderBy(col("c_nationkey").asc)

  /** Fact⋈dim⋈dim with explicit broadcast of both dimensions. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("r_name").asc, col("n_name").asc)

  /** LEFT OUTER: customers with zero orders survive with count 0. */
  def joinLeft(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey").asc)

  /** RIGHT OUTER: same result as joinLeft, exercised from the other side. */
  def joinRight(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"), "right_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey").asc)

  /** FULL OUTER over two pre-aggregated sides (nation-level rollups), so
    * both null-extension directions actually occur. */
  def joinFull(spark: SparkSession, dir: String): DataFrame = {
    val cn = t(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
    val sn = t(spark, dir, "supplier")
      .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("nk_c") === col("nk_s"), "full_outer")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
              col("n_cust"), col("n_supp"))
      .orderBy(col("nationkey").asc)
  }

  /** LEFT SEMI = WHERE EXISTS (no right-side columns, no row duplication). */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc)

  /** LEFT ANTI = WHERE NOT EXISTS: customers with no urgent order (the
    * complement of joinSemi — guaranteed non-empty in this corpus, unlike
    * "no orders at all"). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey").asc)

  /** CROSS: region × supplier (both bounded); BroadcastNestedLoopJoin. */
  def joinCross(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "region").select(col("r_name"))
      .crossJoin(t(spark, dir, "supplier").select(col("s_name")))
      .orderBy(col("r_name").asc, col("s_name").asc)

  /** Non-equi range join: events.value against a tiny in-line bands table.
    * The bands side is broadcast, so the events side never shuffles. */
  def joinThetaRange(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.createDataFrame(Seq(
      ("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1000000.0)))
      .toDF("band", "lo", "hi")
    t(spark, dir, "events")
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
           round(sum(dec("value")), 2).cast("double").as("sum_value"))
      .orderBy(col("band").asc)
  }

  /** AS-OF join: for every purchase event, the latest click by the same
    * user at-or-before the purchase timestamp (NULL if none). Implemented
    * as union + running max over a per-user window — one shuffle, no
    * intermediate blowup (see scale notes). DuckDB oracle uses its native
    * ASOF LEFT JOIN. */
  def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
              lit(null).cast("long").as("p_event_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("kind"),
              col("event_id").as("p_event_id"), lit(null).cast("timestamp").as("click_ts"))
    // kind asc => a click at exactly the purchase ts is visible to it (>= as-of).
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_click_ts", max(col("click_ts")).over(w))
      .filter(col("kind") === 1)
      .select(col("p_event_id").as("event_id"), col("user_id"),
              date_format(col("asof_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"))
      .orderBy(col("event_id").asc)
  }

  /** Same as-of semantics through the NATIVE operator (graft.plans
    * .AsOfJoinPlan -> AsOfJoinStrategy -> AsOfJoinExec): one shuffle per
    * side + per-partition merge with O(1) state — the (c)-tier custom
    * plan path of SURVEY.md §4.3. Oracle: DuckDB ASOF LEFT JOIN. */
  def joinAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_ts_us"))
    graft.plans.AsOfJoin.asof(purchases, clicks, "user_id", "c_user", "ts_us", "c_ts_us")
      .select(col("event_id"), col("user_id"),
              date_format(timestamp_micros(col("c_ts_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .as("click_ts"))
      .orderBy(col("event_id").asc)
  }

  /** Forward as-of through the native operator (r4): each purchase matched
    * to the same user's NEXT click at-or-after it — the "what happened
    * next" direction (follow-up attribution, next-event latency). Same
    * one-shuffle-per-side merge exec, direction flag only. */
  def joinAsofFwd(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_ts_us"))
    graft.plans.AsOfJoin.asof(purchases, clicks, "user_id", "c_user", "ts_us", "c_ts_us",
        direction = "forward")
      .select(col("event_id"), col("user_id"),
              date_format(timestamp_micros(col("c_ts_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .as("next_click_ts"))
      .orderBy(col("event_id").asc)
  }

  /** Inner as-of through the native operator (r4): only purchases WITH a
    * prior click survive — DuckDB's default `ASOF JOIN`. */
  def joinAsofInner(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_ts_us"))
    graft.plans.AsOfJoin.asof(purchases, clicks, "user_id", "c_user", "ts_us", "c_ts_us",
        joinType = "inner")
      .select(col("event_id"), col("user_id"),
              date_format(timestamp_micros(col("c_ts_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .as("click_ts"))
      .orderBy(col("event_id").asc)
  }

  /** Tolerance-bounded as-of (r7): same backward merge, but a match older
    * than the bound is rejected and the left row null-extends — pandas
    * merge_asof(tolerance=…) semantics. The attribution cutoff every
    * real funnel needs ("credit the click only within the window");
    * post-filtering the unbounded as-of is equivalent for backward
    * matches (the rejected match is the NEWEST candidate — nothing
    * younger exists), which is exactly what the oracle does, but the
    * native bound skips the projection of doomed matches inside the
    * exec. 36 h splits this corpus's match-age distribution near its
    * median, so both outcomes are exercised. */
  def joinAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_ts_us"))
    graft.plans.AsOfJoin.asof(purchases, clicks, "user_id", "c_user", "ts_us", "c_ts_us",
        tolerance = Some(129600L * 1000000L)) // 36 h in µs
      .select(col("event_id"), col("user_id"),
              date_format(timestamp_micros(col("c_ts_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .as("click_ts"))
      .orderBy(col("event_id").asc)
  }

  /** Null-safe equi-join (r4): `<=>` treats NULL as a joinable value —
    * the semantics MERGE/upsert and SCD pipelines need when the business
    * key is nullable (plain `=` silently drops every NULL row). Spark
    * plans EqualNullSafe as a real equi-join key (hash/SMJ, not a theta
    * join). Scale note: NULL hashes as ONE key — a mostly-null key column
    * is the worst skew case; salt the null bucket exactly like
    * `join_skew_salted` when that happens. */
  def joinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    val dim = spark.createDataFrame(Seq(
        (None: Option[Long], "unbucketed"),
        (Some(1L), "bucket_1"), (Some(2L), "bucket_2")))
      .toDF("bk", "bucket_name")
    val fact = t(spark, dir, "customer")
      .withColumn("bk", expr("nullif(c_custkey % 5, 0)"))
    fact.join(dim, fact("bk") <=> dim("bk"))
      .groupBy(col("bucket_name"))
      .agg(count(lit(1)).as("n"),
           round(sum(dec("c_acctbal")), 2).cast("double").as("sum_bal"))
      .orderBy(col("bucket_name").asc)
  }

  /** Nearest-direction as-of (r14): per purchase, the click with the
    * SMALLEST absolute time distance, ties preferring the backward
    * (earlier) match — pandas merge_asof(direction='nearest'). Composed
    * from two native single-direction as-of merges (each one sort-merge
    * pass) joined 1:1 on the left key — no all-pairs work at any scale;
    * the oracle replays the same composition in DuckDB. */
  def joinAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_ts_us"))
    val back = graft.plans.AsOfJoin.asof(purchases, clicks,
        "user_id", "c_user", "ts_us", "c_ts_us", direction = "backward")
      .select(col("event_id"), col("user_id"), col("ts_us"),
              col("c_ts_us").as("b_ts"))
    val fwd = graft.plans.AsOfJoin.asof(purchases, clicks,
        "user_id", "c_user", "ts_us", "c_ts_us", direction = "forward")
      .select(col("event_id").as("f_event_id"), col("c_ts_us").as("f_ts"))
    val nearest = back.join(fwd, back("event_id") === fwd("f_event_id"), "inner")
      .withColumn("near_ts",
        when(col("b_ts").isNull, col("f_ts"))
          .when(col("f_ts").isNull, col("b_ts"))
          .when(col("ts_us") - col("b_ts") <= col("f_ts") - col("ts_us"), col("b_ts"))
          .otherwise(col("f_ts")))
    nearest.select(col("event_id"), col("user_id"),
        date_format(timestamp_micros(col("near_ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("nearest_click_ts"))
      .orderBy(col("event_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_null_safe" -> (joinNullSafe _),
    "join_asof_native" -> (joinAsofNative _),
    "join_asof_fwd" -> (joinAsofFwd _),
    "join_asof_nearest" -> (joinAsofNearest _),
    "join_asof_inner" -> (joinAsofInner _),
    "join_asof_tolerance" -> (joinAsofTolerance _),
    "join_inner" -> (joinInner _),
    "join_broadcast" -> (joinBroadcast _),
    "join_left" -> (joinLeft _),
    "join_right" -> (joinRight _),
    "join_full" -> (joinFull _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "join_cross" -> (joinCross _),
    "join_theta_range" -> (joinThetaRange _),
    "join_asof" -> (joinAsof _))

  val oracle: Map[String, String] = Map(
    "join_null_safe" ->
      """WITH dim(bk, bucket_name) AS (
        |  VALUES (NULL, 'unbucketed'), (1, 'bucket_1'), (2, 'bucket_2')),
        |f AS (SELECT nullif(c_custkey % 5, 0) AS bk, c_acctbal FROM customer)
        |SELECT bucket_name, count(1) AS n,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_bal
        |FROM f JOIN dim ON f.bk IS NOT DISTINCT FROM dim.bk
        |GROUP BY bucket_name ORDER BY bucket_name ASC NULLS FIRST""".stripMargin,
    "join_asof_native" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin,
    "join_asof_tolerance" ->
      """SELECT p.event_id, p.user_id,
        |  CASE WHEN c.ts IS NOT NULL
        |        AND epoch_us(p.ts) - epoch_us(c.ts) <= 129600000000
        |       THEN strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') END AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin,
    "join_asof_nearest" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT * FROM events WHERE event_type = 'click'),
        |     b AS (SELECT p.event_id, p.user_id, p.ts, c.ts AS b_ts
        |           FROM p ASOF LEFT JOIN c
        |             ON p.user_id = c.user_id AND p.ts >= c.ts),
        |     f AS (SELECT p.event_id, c.ts AS f_ts
        |           FROM p ASOF LEFT JOIN c
        |             ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT b.event_id, b.user_id,
        |  strftime(CASE
        |    WHEN b.b_ts IS NULL THEN f.f_ts
        |    WHEN f.f_ts IS NULL THEN b.b_ts
        |    WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
        |      <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN b.b_ts
        |    ELSE f.f_ts END, '%Y-%m-%d %H:%M:%S.%f') AS nearest_click_ts
        |FROM b JOIN f ON b.event_id = f.event_id
        |ORDER BY b.event_id ASC NULLS FIRST""".stripMargin,
    "join_asof_fwd" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS next_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin,
    "join_asof_inner" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin,
    "join_inner" ->
      """SELECT c_nationkey, count(1) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, n_name, count(1) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "join_right" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "join_full" ->
      """SELECT coalesce(cn.nk, sn.nk) AS nationkey, n_cust, n_supp
        |FROM (SELECT c_nationkey AS nk, count(1) AS n_cust FROM customer GROUP BY 1) cn
        |FULL JOIN (SELECT s_nationkey AS nk, count(1) AS n_supp FROM supplier GROUP BY 1) sn
        |  ON cn.nk = sn.nk
        |ORDER BY nationkey ASC NULLS FIRST""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,
    "join_cross" ->
      """SELECT r_name, s_name FROM region CROSS JOIN supplier
        |ORDER BY r_name ASC NULLS FIRST, s_name ASC NULLS FIRST""".stripMargin,
    "join_theta_range" ->
      """WITH bands(band, lo, hi) AS (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1000000.0))
        |SELECT band, count(1) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band ASC NULLS FIRST""".stripMargin,
    "join_asof" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin)
}
