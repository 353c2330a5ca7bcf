package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function surface (SURVEY.md §2.B "Window functions" — ABSENT in
  * the reference).
  *
  * Scale notes (100 TB):
  *  - Every window here partitions by a real key (customer, supplier,
  *    status): one shuffle on the partition key, then a per-partition sort.
  *    No `Window.orderBy` without partitionBy anywhere — that collapses to
  *    a single task at scale.
  *  - `win_frame_range` uses a numeric day offset so the RANGE frame is an
  *    O(1) sliding-frame scan per partition, not a per-row rescan.
  *  - `topk_per_group` filters rank<=k immediately after the window so only
  *    k rows per group survive the stage — the window itself is the only
  *    full-data pass.
  */
object Windows {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)

  /** rank / dense_rank / row_number per order-status, deterministic via the
    * unique o_orderkey tiebreak. */
  def winRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
              rank().over(w).as("rnk"),
              dense_rank().over(w).as("drnk"),
              row_number().over(w).as("rn"))
      .orderBy(col("o_orderstatus").asc, col("o_orderkey").asc)
  }

  /** `win_percent_rank` (r10): relative-position analytics — the
    * distribution functions `percent_rank` ((rank-1)/(n-1)) and
    * `cume_dist` (rows ≤ current / n) per status partition, the
    * percentile-style window family `win_ntile`'s bucketing
    * approximates. Floor-rounded to 4 dp so IEEE division agrees
    * across engines; same one-shuffle window as every rank. */
  def winPercentRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .filter(col("o_custkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
              floor(percent_rank().over(w) * 10000).cast("long").as("pr4"),
              floor(cume_dist().over(w) * 10000).cast("long").as("cd4"))
      .orderBy(col("o_orderstatus").asc, col("o_orderkey").asc)
  }

  /** lag/lead of order totalprice within each customer's order history. */
  def winLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
              round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
              round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  /** Running sum per supplier: ROWS UNBOUNDED PRECEDING..CURRENT ROW over a
    * unique total order, so partial sums are reproducible. DECIMAL
    * accumulation keeps every prefix sum exact vs the oracle. */
  def winFrameRows(spark: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is not unique in this corpus; the window
    // order adds quantity+price to reach a unique total order, and the
    // output order adds running_qty (strictly increasing within ties).
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc,
               col("l_quantity").asc, col("l_extendedprice").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
              round(sum(col("l_quantity").cast("decimal(18,2)")).over(w), 2).cast("double")
                .as("running_qty"))
      .orderBy(col("l_suppkey").asc, col("l_orderkey").asc, col("l_linenumber").asc,
               col("running_qty").asc)
  }

  /** 30-day moving average over a RANGE frame keyed on integer day number
    * (RANGE over a timestamp needs a numeric sort key in both engines). */
  def winFrameRange(spark: SparkSession, dir: String): DataFrame = {
    val dayNum = datediff(col("o_orderdate").cast("date"), to_date(lit("1995-01-01")))
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("day_num").asc)
      .rangeBetween(-29, 0)
    // moving avg as exact-decimal frame sum / frame count -> identical IEEE
    // divide + floor-round in both engines (see graft.Det).
    t(spark, dir, "orders")
      .withColumn("day_num", dayNum)
      .select(col("o_orderkey"), col("o_orderstatus"), col("day_num"),
              graft.Det.r2(sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double") /
                           count(lit(1)).over(w)).as("mavg_price"))
      .orderBy(col("o_orderkey").asc)
  }

  /** Top-3 orders per customer by totalprice: window + rank<=k filter. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
              round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_custkey").asc, col("rnk").asc)
  }

  /** ntile / cume_dist / percent_rank per order priority — the quantile-
    * bucketing window family (train/validation splits, score banding).
    * Unique (o_totalprice, o_orderkey) order keeps every rank function
    * deterministic. */
  def winNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
              ntile(4).over(w).as("quartile"),
              graft.Det.r4(cume_dist().over(w)).as("cume"),
              graft.Det.r4(percent_rank().over(w)).as("pct_rank"))
      .orderBy(col("o_orderpriority").asc, col("o_orderkey").asc)
  }

  /** first/last/nth over the FULL partition frame (unbounded both ways) —
    * the "compare each row to its group's extremes" analytic; frame must
    * be explicit because last_value's default frame ends at CURRENT ROW. */
  def winFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
              first(col("o_totalprice")).over(w).as("first_price"),
              last(col("o_totalprice")).over(w).as("last_price"),
              nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  /** Running DISTINCT count over a growing frame (r7) — "how many
    * distinct event types has this user produced so far": windowed
    * count(DISTINCT) is unsupported in Spark, so the portable form is
    * `size(array_distinct(collect_list))` over the frame — the set size
    * is order-independent, so the result is deterministic even though
    * the collected list isn't. State is one frame-sized list per row;
    * bounded here by the small per-user type alphabet (at an unbounded
    * alphabet the HLL sketch, not a window, is the 100 TB form). */
  def winDistinctCount(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.Tables.t(spark, dir, "events")
      .filter(col("user_id") % 5 === 0)
      .select(col("user_id"), col("event_id"),
        size(array_distinct(collect_list(col("event_type")).over(w)))
          .cast("long").as("n_types_seen"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_distinct_count" -> (winDistinctCount _),
    "win_first_last" -> (winFirstLast _),
    "win_ntile" -> (winNtile _),
    "win_rank" -> (winRank _),
    "win_percent_rank" -> (winPercentRank _),
    "win_lag_lead" -> (winLagLead _),
    "win_frame_rows" -> (winFrameRows _),
    "win_frame_range" -> (winFrameRange _),
    "topk_per_group" -> (topkPerGroup _))

  val oracle: Map[String, String] = Map(
    "win_percent_rank" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(floor(percent_rank() OVER w * 10000) AS BIGINT) AS pr4,
        |  CAST(floor(cume_dist() OVER w * 10000) AS BIGINT) AS cd4
        |FROM orders WHERE o_custkey % 10 = 0
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "win_distinct_count" ->
      """SELECT user_id, event_id,
        |  CAST(len(list_distinct(list(event_type) OVER w)) AS BIGINT) AS n_types_seen
        |FROM events WHERE user_id % 5 = 0
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin,
    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "win_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  floor(cume_dist() OVER w * 10000 + 0.5) / 10000 AS cume,
        |  floor(percent_rank() OVER w * 10000 + 0.5) / 10000 AS pct_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST)
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "win_rank" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  CAST(row_number() OVER w AS INTEGER) AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "win_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)
        |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin,
    "win_frame_rows" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE) AS running_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate ASC NULLS FIRST, l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |                      l_quantity ASC NULLS FIRST, l_extendedprice ASC NULLS FIRST
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey ASC NULLS FIRST, l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST,
        |         running_qty ASC NULLS FIRST""".stripMargin,
    "win_frame_range" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day_num,
        |  floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(1) OVER w * 100 + 0.5) / 100 AS mavg_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) ASC
        |             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, rnk, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST) AS INTEGER) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY o_custkey ASC NULLS FIRST, rnk ASC NULLS FIRST""".stripMargin)
}
