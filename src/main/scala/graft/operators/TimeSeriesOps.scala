package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series operators over the `events` table (ABSENT in the reference
  * — it emits a hardware-timestamp column, `main.rs:177`, but never
  * exploits ordering; these are the queries its users run downstream on
  * capture-derived time series).
  *
  * Scale notes (100 TB):
  *  - `ts_downsample` is the canonical metrics-rollup: one hash-agg
  *    shuffle keyed on (series, bucket); map-side combine reduces the
  *    shuffle to |series × buckets| rows per task regardless of input
  *    size. Downsampling a month of nanosecond captures to minute grain
  *    is a ~10⁹× row reduction before anything leaves the executor.
  *  - `ts_gap_fill` materializes the dense minute grid with a generator
  *    (`sequence` + `explode`) — O(span), NOT O(input) — and left-joins
  *    the sparse aggregates onto it. The grid side is tiny (one row per
  *    minute of wall-clock span: ~525k/year) so it broadcasts; at wider
  *    spans generate per-day subranges and union. Never densify before
  *    aggregating.
  */
object TimeSeriesOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)
  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** Minute-grain OHLC-style downsample per event_type: count, exact
    * DECIMAL sum, min/max (selections — bit-exact across engines). */
  def tsDownsample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("n"),
           round(sum(dec("value")), 2).cast("double").as("sum_value"),
           min(col("value")).as("min_value"),
           max(col("value")).as("max_value"))
      .select(col("event_type"), date_format(col("m"), TsFmt).as("minute"),
              col("n"), col("sum_value"), col("min_value"), col("max_value"))
      .orderBy(col("event_type").asc, col("minute").asc)

  /** Dense minute grid for the 'click' series with zero-filled gaps:
    * sparse per-minute counts left-joined onto a generated
    * [min, max]-minute sequence. */
  def tsGapFill(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "events")
      .filter(col("event_type") === "click")
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("n"))
    val grid = counts
      .agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 minute"))).as("m"))
    grid.join(counts, Seq("m"), "left")
      .select(date_format(col("m"), TsFmt).as("minute"),
              coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("minute").asc)
  }

  /** Ordered-funnel analysis: of all users, how many ever signed up, how
    * many clicked AFTER their first signup, and how many completed
    * signup → click → purchase in order (first-occurrence ordering).
    * One hash agg to per-user stage timestamps (conditional min — no
    * self-joins, no per-stage scans), then a single-row reduce: at 100 TB
    * the funnel costs exactly one shuffle of |users| tiny rows. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    def firstTs(tpe: String) =
      min(when(col("event_type") === tpe, col("ts"))).as(tpe.take(1))
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(firstTs("signup"), firstTs("click"), firstTs("purchase"))
      .agg(count(lit(1)).as("n_users"),
           count(col("s")).as("n_signup"),
           count(when(col("s") < col("c"), 1)).as("n_signup_click"),
           count(when(col("s") < col("c") && col("c") < col("p"), 1))
             .as("n_full_funnel"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_stages" -> (funnelStages _),
    "ts_downsample" -> (tsDownsample _),
    "ts_gap_fill" -> (tsGapFill _))

  val oracle: Map[String, String] = Map(
    "funnel_stages" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(ts) FILTER (event_type = 'signup')   AS s,
        |    min(ts) FILTER (event_type = 'click')    AS c,
        |    min(ts) FILTER (event_type = 'purchase') AS p
        |  FROM events GROUP BY user_id)
        |SELECT count(1) AS n_users,
        |  count(s) AS n_signup,
        |  count(1) FILTER (s < c) AS n_signup_click,
        |  count(1) FILTER (s < c AND c < p) AS n_full_funnel
        |FROM u""".stripMargin,
    "ts_downsample" ->
      """SELECT event_type,
        |  strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute,
        |  count(1) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type ASC NULLS FIRST, minute ASC NULLS FIRST""".stripMargin,
    "ts_gap_fill" ->
      """WITH c AS (
        |  SELECT date_trunc('minute', ts) AS m, count(1) AS n
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |g AS (
        |  SELECT unnest(generate_series((SELECT min(m) FROM c),
        |                                (SELECT max(m) FROM c),
        |                                INTERVAL 1 minute)) AS m)
        |SELECT strftime(g.m, '%Y-%m-%d %H:%M:%S') AS minute,
        |  coalesce(c.n, 0) AS n
        |FROM g LEFT JOIN c USING (m)
        |ORDER BY minute ASC NULLS FIRST""".stripMargin)
}
