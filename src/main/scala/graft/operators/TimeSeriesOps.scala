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

  /** Cohort retention matrix (r4): users grouped by first-activity day,
    * distinct active users per (cohort, day-offset) — THE product/data
    * health analytic over an events stream. Scale shape: the first-day agg
    * is one shuffle keyed on user; the events ⋈ cohort join is
    * co-partitioned on the same key (no extra exchange under AQE); the
    * final agg is |cohorts × offsets| tiny rows. Nothing is quadratic and
    * no per-day scan loop exists. */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
              col("day_offset"), col("n_users"))
      .orderBy(col("cohort_day").asc, col("day_offset").asc)
  }

  /** Daily OHLC bars per event_type (r4): open/close = first/last value in
    * (ts, event_id) order — the tiebreak makes ties deterministic — plus
    * high/low/count. One window pass (partitioned by the bar key, full
    * frame) then one agg on the same key: the window and the agg share a
    * partitioning, so the plan carries ONE exchange. The canonical
    * market-data / metrics resample. */
  def tsOhlc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "events")
      .withColumn("day", to_date(col("ts")))
      .withColumn("o", first(col("value")).over(w))
      .withColumn("c", last(col("value")).over(w))
      .groupBy(col("event_type"), col("day"))
      .agg(graft.Det.r4(min(col("o"))).as("open"),
           graft.Det.r4(max(col("value"))).as("high"),
           graft.Det.r4(min(col("value"))).as("low"),
           graft.Det.r4(min(col("c"))).as("close"),
           count(lit(1)).as("n"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
              col("open"), col("high"), col("low"), col("close"), col("n"))
      .orderBy(col("event_type").asc, col("day").asc)
  }

  /** Forward-fill over the dense minute grid (r5): the last-observation-
    * carried-forward resample every downstream consumer of sparse sensor /
    * tick data wants. Per-minute closing value (last in (ts, event_id)
    * order — deterministic under ts ties), left-joined onto the generated
    * grid, then `last(_, ignoreNulls)` over a running frame carries it
    * across the gaps. The fill window here is a single global series (one
    * partition); the production shape partitions by series key, which
    * makes the window embarrassingly parallel — per-series state is one
    * value, so a 100 TB fill streams. Minutes before the first
    * observation stay NULL (both engines agree). */
  def tsFillForward(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLast = Window.partitionBy(col("m"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val perMin = t(spark, dir, "events")
      .filter(col("event_type") === "click")
      .withColumn("m", date_trunc("minute", col("ts")))
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("m"), col("value").as("v"))
    val grid = perMin
      .agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 minute"))).as("m"))
    val wFill = Window.orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perMin, Seq("m"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(wFill))
      .select(date_format(col("m"), TsFmt).as("minute"),
              col("v").isNotNull.as("observed"),
              graft.Det.r2(col("filled")).as("value"))
      .orderBy(col("minute").asc)
  }

  /** Linear interpolation over series gaps (r6) — the step past
    * `ts_fill_forward`'s LOCF: each missing minute gets
    * prev + (next − prev) · Δt/ΔT from its nearest OBSERVED neighbors
    * (IGNORE NULLS windows both directions; edges degrade to the one
    * neighbor that exists). Time fractions are exact integer epoch
    * seconds divided in double — both engines run the identical IEEE
    * expression, and the result grid-snaps to 1e-4. Same two-window,
    * one-sort shape as fill-forward: at 100 TB the windows partition by
    * series key (one series here), so each series interpolates inside
    * one task. */
  def tsInterpolate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLast = Window.partitionBy(col("m"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val perMin = t(spark, dir, "events")
      .filter(col("event_type") === "click")
      .withColumn("m", date_trunc("minute", col("ts")))
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("m"), col("value").as("v"))
    val grid = perMin
      .agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 minute"))).as("m"))
    val wPrev = Window.orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy(col("m"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val mObs = when(col("v").isNotNull, col("m"))
    grid.join(perMin, Seq("m"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pm", last(mObs, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nm", first(mObs, ignoreNulls = true).over(wNext))
      .select(
        date_format(col("m"), TsFmt).as("minute"),
        col("v").isNotNull.as("observed"),
        graft.Det.r4(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (unix_timestamp(col("m")) - unix_timestamp(col("pm"))).cast("double") /
              (unix_timestamp(col("nm")) - unix_timestamp(col("pm"))).cast("double")))
          .as("value"))
      .orderBy(col("minute").asc)
  }

  /** Gap-based sessionization: per user, a new session starts when the
    * inter-event gap exceeds 6 hours. The boundary flag comes from a
    * `lag` window, the session id from a running sum over the same
    * (user_id, ts, event_id) order — both windows share the one shuffle
    * keyed on user_id, and every comparison is exact BIGINT microseconds
    * (no float time math). This is the batch twin of `stream_session`
    * (`session_window`): same session semantics, derivable offline over
    * 100 TB with exactly one shuffle of |events| rows. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val GapUs = 6L * 3600 * 1000000
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > GapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .select(col("user_id"), col("session_id"), col("n_events"),
              date_format(col("lo"), TsFmt).as("start_ts"),
              date_format(col("hi"), TsFmt).as("end_ts"),
              ((unix_micros(col("hi")) - unix_micros(col("lo")))
                 / lit(1000000L)).cast("long").as("dur_s"))
      .orderBy(col("user_id").asc, col("session_id").asc)
  }

  /** Event-type transition matrix: per user, consecutive event pairs in
    * time order (the Markov-chain / user-journey statistic). One `lead`
    * window on the user_id shuffle, then a map-side-combined count over
    * the |types|² transition space — the shuffle output is O(|types|²)
    * rows at any corpus size. */
  def tsTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("nxt").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type").asc, col("to_type").asc)
  }

  /** Z-score anomaly detection (r5): events whose value deviates more
    * than 2σ from their type's mean — the alerting primitive over any
    * capture-derived metric stream. Two passes in ONE plan: a per-type
    * stats agg (n, Σv, Σv² as EXACT decimals — order-independent across
    * 1000 executors, same device as `agg_stats`) broadcast back onto the
    * stream (|types| rows, never a shuffle of the events), then a
    * codegen'd filter. Mean/σ and the 2σ verdict are computed from the
    * exact sums in identical IEEE double steps in both engines, so the
    * survivor SET (not just the scores) is engine-independent. */
  def tsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val vd = dec("value")
    def d(c: String) = col(c).cast("double")
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(vd).as("sx_d"),
           sum((vd * vd).cast("decimal(38,4)")).as("sxx_d"))
      .select(col("event_type"),
        (d("sx_d") / d("n")).as("mean"),
        sqrt((d("sxx_d") - d("sx_d") * d("sx_d") / d("n")) / (d("n") - 1)).as("sd"))
    val v = vd.cast("double")
    ev.join(broadcast(stats), "event_type")
      .filter(abs(v - col("mean")) > lit(2.0) * col("sd"))
      .select(col("event_id"), col("event_type"), v.as("value"),
              graft.Det.r4((v - col("mean")) / col("sd")).as("z"))
      .orderBy(col("event_id").asc)
  }

  /** Lag-1 autocorrelation per series (r7): is the signal noise, drift,
    * or oscillation? Computed from exact DECIMAL co-moments (the
    * ts_anomaly trick — Pearson corr as one streaming float aggregate is
    * summation-order-dependent, so the sums happen in DECIMAL and the
    * division in double from identical inputs on any engine). The lag
    * window and the co-moment aggregation share the event_type
    * partitioning, so the whole thing is one shuffle. */
  def tsAcf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val vd = col("value").cast("decimal(18,2)")
    val pairs = Tables.t(spark, dir, "events")
      .select(col("event_type"), vd.as("x"), lag(vd, 1).over(w).as("y"))
      .filter(col("y").isNotNull)
    def d(c: String) = col(c).cast("double")
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("x")).as("sx"), sum(col("y")).as("sy"),
           sum((col("x") * col("y")).cast("decimal(38,4)")).as("sxy"),
           sum((col("x") * col("x")).cast("decimal(38,4)")).as("sxx"),
           sum((col("y") * col("y")).cast("decimal(38,4)")).as("syy"))
      .select(col("event_type"), col("n"),
        graft.Det.r4(
          (d("n") * d("sxy") - d("sx") * d("sy")) /
            (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
             sqrt(d("n") * d("syy") - d("sy") * d("sy")))).as("acf1"))
      .orderBy(col("event_type").asc)
  }

  /** Windowed EWMA (r7): exponential smoothing over the last 8 samples
    * per series — α = 0.5, so every weight is an EXACT power of two
    * (0.5^k scales a double without rounding) and the 8-term numerator /
    * denominator sums run in fixed expression order: bit-identical on
    * any engine, unlike a recursive EWMA (not SQL-expressible) or a
    * float window-sum (order-dependent). Sequence starts normalize by
    * the weights actually present. The 8 lag columns share ONE window
    * spec, so Spark evaluates them in a single pass over the series
    * partitioning (one shuffle). */
  def tsEwma(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val terms = (0 until 8).map { k =>
      val x = lag(col("value"), k).over(w)
      val wt = lit(math.pow(0.5, k)) // 1, 0.5, 0.25, … — exact binary
      (when(x.isNotNull, wt * x).otherwise(lit(0.0)),
       when(x.isNotNull, wt).otherwise(lit(0.0)))
    }
    Tables.t(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        terms.map(_._1).reduce(_ + _).as("num"),
        terms.map(_._2).reduce(_ + _).as("den"))
      .filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("event_type"),
        graft.Det.r4(col("num") / col("den")).as("ewma"))
      .orderBy(col("event_id").asc)
  }

  /** Windowed HOLT linear-trend smoothing (r12): level+trend double
    * exponential smoothing over the trailing 8 samples of each series —
    * `ℓ_t = α·x_t + (1-α)(ℓ+b)`, `b_t = β(ℓ_t-ℓ) + (1-β)b`, initialized
    * at the window head (`ℓ₀=x₀, b₀=x₁-x₀`), α=1/2, β=1/4 (exact binary
    * fractions). The recurrence is SEQUENTIAL, which normally locks it
    * out of both SQL engines and map-side parallelism; the windowed
    * form unrolls it into a FIXED expression tree over lag() terms —
    * one window pass, fully codegen'd, embarrassingly parallel across
    * series and rows, and bit-identical across engines because both
    * evaluate the same IEEE operation order (neither reassociates float
    * arithmetic). Rows without a full 8-window (series heads) drop.
    * Output: smoothed level, trend, and the one-step-ahead forecast
    * ℓ+b — the anomaly baseline `ts_anomaly`-style monitors difference
    * against. */
  def tsHolt(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    var df = Tables.t(spark, dir, "events")
      .select(Seq(col("event_id"), col("event_type")) ++
        (0 to 7).map(i => lag(col("value"), 7 - i).over(w).as(s"x$i")): _*)
      .filter(col("x0").isNotNull) // full window only
      .withColumn("l0", col("x0"))
      .withColumn("b0", col("x1") - col("x0"))
    for (i <- 1 to 7) {
      df = df
        .withColumn(s"l$i",
          lit(0.5) * col(s"x$i") + lit(0.5) * (col(s"l${i - 1}") + col(s"b${i - 1}")))
        .withColumn(s"b$i",
          lit(0.25) * (col(s"l$i") - col(s"l${i - 1}")) + lit(0.75) * col(s"b${i - 1}"))
    }
    df.filter(col("event_id") % 20 === 0)
      .select(col("event_id"), col("event_type"),
        graft.Det.r4(col("l7")).as("level"),
        graft.Det.r4(col("b7")).as("trend"),
        graft.Det.r4(col("l7") + col("b7")).as("forecast"))
      .orderBy(col("event_id").asc)
  }

  /** CROSS-correlation at lags 0..3 between the minute-bucketed `click`
    * and `purchase` series (r12) — the lead-lag probe behind "does
    * activity in series A anticipate series B?": bucket both series to
    * a common minute grid (sums as exact DECIMAL — engine-portable),
    * shift one side by the lag (a self-equi-join on `bucket + L`, never
    * a window over the whole grid), and compute Pearson r per lag from
    * exact decimal sums with the same one-double-expression discipline
    * as `ts_acf`. At 100 TB the grid is |minutes| rows per series —
    * aggregation does the data reduction BEFORE any pairing, and each
    * lag's join is grid×grid on an integer key. */
  def tsCrossCorr(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        date_trunc("minute", col("ts")).as("bucket"), // exact, engine-portable
        col("value").cast("decimal(18,2)").as("v"))
    // r19 opt (guide §2.4: shared subtrees, one exchange): the pre-opt
    // shape derived `a`/`b` per lag — 4 unioned joins re-computed the
    // events scan + grid aggregation EIGHT times (different filters on
    // each side defeat ReuseExchange). Now ONE conditional aggregation
    // builds both series per bucket (count-guards reconstruct "bucket
    // had rows of that type" exactly, so an all-NULL value group still
    // contributes its row like the filtered grid did), `a` and `b` are
    // post-exchange filters over the SAME subtree (ReuseExchange dedupes
    // it — the grid aggregates once), and the 4 lag shifts ride ONE
    // equi-join via a 4-element explode on the reduced grid side instead
    // of 4 separate joins. Same join pairs, same sums, same output.
    val both = ev.groupBy(col("bucket")).agg(
      sum(when(col("event_type") === "click", col("v"))).as("x"),
      count(when(col("event_type") === "click", lit(1))).as("nx"),
      sum(when(col("event_type") === "purchase", col("v"))).as("y"),
      count(when(col("event_type") === "purchase", lit(1))).as("ny"))
    val a = both.filter(col("nx") > 0).select(col("bucket"), col("x"))
    val b = both.filter(col("ny") > 0).select(col("bucket").as("bbucket"), col("y"))
    val lags = a.select(col("x"), explode(array((0 to 3).map(l =>
        struct(lit(l).as("lag"),
          (col("bucket") + expr(s"INTERVAL $l MINUTE")).as("jb"))): _*)).as("e"))
      .select(col("e.lag").as("lag"), col("e.jb").as("jb"), col("x"))
      .join(b, col("bbucket") === col("jb"))
      .select(col("lag"), col("x"), col("y"))
    def d(c: String) = col(c).cast("double")
    lags.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,4)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,4)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,4)")).as("syy"))
      .select(col("lag"), col("n"),
        graft.Det.r4(
          (d("n") * d("sxy") - d("sx") * d("sy")) /
            (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
             sqrt(d("n") * d("syy") - d("sy") * d("sy")))).as("xcorr"))
      .orderBy(col("lag").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_cross_corr" -> (tsCrossCorr _),
    "ts_holt" -> (tsHolt _),
    "ts_ewma" -> (tsEwma _),
    "ts_acf" -> (tsAcf _),
    "ts_anomaly" -> (tsAnomaly _),
    "sessionize" -> (sessionize _),
    "ts_transitions" -> (tsTransitions _),
    "ts_fill_forward" -> (tsFillForward _),
    "ts_interpolate" -> (tsInterpolate _),
    "funnel_stages" -> (funnelStages _),
    "retention_cohort" -> (retentionCohort _),
    "ts_downsample" -> (tsDownsample _),
    "ts_gap_fill" -> (tsGapFill _),
    "ts_ohlc" -> (tsOhlc _))

  val oracle: Map[String, String] = Map(
    "ts_cross_corr" ->
      """WITH ev AS (
        |  SELECT event_type, date_trunc('minute', ts) AS bucket,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |grid AS (
        |  SELECT event_type, bucket, sum(v) AS sv FROM ev GROUP BY 1, 2),
        |a AS (SELECT bucket, sv AS x FROM grid WHERE event_type = 'click'),
        |b AS (SELECT bucket AS bbucket, sv AS y FROM grid WHERE event_type = 'purchase'),
        |lags AS (
        |  SELECT l.lag, a.x, b.y
        |  FROM (VALUES (0), (1), (2), (3)) AS l(lag), a
        |  JOIN b ON b.bbucket = a.bucket + l.lag * INTERVAL 1 MINUTE),
        |s AS (
        |  SELECT lag, count(1) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(CAST(x * y AS DECIMAL(38,4))) AS sxy,
        |    sum(CAST(x * x AS DECIMAL(38,4))) AS sxx,
        |    sum(CAST(y * y AS DECIMAL(38,4))) AS syy
        |  FROM lags GROUP BY lag)
        |SELECT CAST(lag AS INT) AS lag, n,
        |  floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |           * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |        * 10000 + 0.5) / 10000 AS xcorr
        |FROM s
        |ORDER BY lag ASC NULLS FIRST""".stripMargin,
    "ts_holt" ->
      """WITH l AS (
        |  SELECT event_id, event_type,
        |    lag(value, 7) OVER w AS x0, lag(value, 6) OVER w AS x1,
        |    lag(value, 5) OVER w AS x2, lag(value, 4) OVER w AS x3,
        |    lag(value, 3) OVER w AS x4, lag(value, 2) OVER w AS x5,
        |    lag(value, 1) OVER w AS x6, lag(value, 0) OVER w AS x7
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC)),
        |s0 AS (
        |  SELECT *, x0 AS l0, x1 - x0 AS b0 FROM l WHERE x0 IS NOT NULL),
        |s1 AS (SELECT *, 0.5 * x1 + 0.5 * (l0 + b0) AS l1 FROM s0),
        |t1 AS (SELECT *, 0.25 * (l1 - l0) + 0.75 * b0 AS b1 FROM s1),
        |s2 AS (SELECT *, 0.5 * x2 + 0.5 * (l1 + b1) AS l2 FROM t1),
        |t2 AS (SELECT *, 0.25 * (l2 - l1) + 0.75 * b1 AS b2 FROM s2),
        |s3 AS (SELECT *, 0.5 * x3 + 0.5 * (l2 + b2) AS l3 FROM t2),
        |t3 AS (SELECT *, 0.25 * (l3 - l2) + 0.75 * b2 AS b3 FROM s3),
        |s4 AS (SELECT *, 0.5 * x4 + 0.5 * (l3 + b3) AS l4 FROM t3),
        |t4 AS (SELECT *, 0.25 * (l4 - l3) + 0.75 * b3 AS b4 FROM s4),
        |s5 AS (SELECT *, 0.5 * x5 + 0.5 * (l4 + b4) AS l5 FROM t4),
        |t5 AS (SELECT *, 0.25 * (l5 - l4) + 0.75 * b4 AS b5 FROM s5),
        |s6 AS (SELECT *, 0.5 * x6 + 0.5 * (l5 + b5) AS l6 FROM t5),
        |t6 AS (SELECT *, 0.25 * (l6 - l5) + 0.75 * b5 AS b6 FROM s6),
        |s7 AS (SELECT *, 0.5 * x7 + 0.5 * (l6 + b6) AS l7 FROM t6),
        |t7 AS (SELECT *, 0.25 * (l7 - l6) + 0.75 * b6 AS b7 FROM s7)
        |SELECT event_id, event_type,
        |  floor(l7 * 10000 + 0.5) / 10000 AS level,
        |  floor(b7 * 10000 + 0.5) / 10000 AS trend,
        |  floor((l7 + b7) * 10000 + 0.5) / 10000 AS forecast
        |FROM t7 WHERE event_id % 20 = 0
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "ts_ewma" ->
      """WITH l AS (
        |  SELECT event_id, event_type,
        |    lag(value, 0) OVER w AS x0, lag(value, 1) OVER w AS x1,
        |    lag(value, 2) OVER w AS x2, lag(value, 3) OVER w AS x3,
        |    lag(value, 4) OVER w AS x4, lag(value, 5) OVER w AS x5,
        |    lag(value, 6) OVER w AS x6, lag(value, 7) OVER w AS x7
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts ASC, event_id ASC))
        |SELECT event_id, event_type,
        |  floor(((CASE WHEN x0 IS NOT NULL THEN 1.0 * x0 ELSE 0.0 END
        |        + CASE WHEN x1 IS NOT NULL THEN 0.5 * x1 ELSE 0.0 END
        |        + CASE WHEN x2 IS NOT NULL THEN 0.25 * x2 ELSE 0.0 END
        |        + CASE WHEN x3 IS NOT NULL THEN 0.125 * x3 ELSE 0.0 END
        |        + CASE WHEN x4 IS NOT NULL THEN 0.0625 * x4 ELSE 0.0 END
        |        + CASE WHEN x5 IS NOT NULL THEN 0.03125 * x5 ELSE 0.0 END
        |        + CASE WHEN x6 IS NOT NULL THEN 0.015625 * x6 ELSE 0.0 END
        |        + CASE WHEN x7 IS NOT NULL THEN 0.0078125 * x7 ELSE 0.0 END)
        |       / (CASE WHEN x0 IS NOT NULL THEN 1.0 ELSE 0.0 END
        |        + CASE WHEN x1 IS NOT NULL THEN 0.5 ELSE 0.0 END
        |        + CASE WHEN x2 IS NOT NULL THEN 0.25 ELSE 0.0 END
        |        + CASE WHEN x3 IS NOT NULL THEN 0.125 ELSE 0.0 END
        |        + CASE WHEN x4 IS NOT NULL THEN 0.0625 ELSE 0.0 END
        |        + CASE WHEN x5 IS NOT NULL THEN 0.03125 ELSE 0.0 END
        |        + CASE WHEN x6 IS NOT NULL THEN 0.015625 ELSE 0.0 END
        |        + CASE WHEN x7 IS NOT NULL THEN 0.0078125 ELSE 0.0 END))
        |    * 10000 + 0.5) / 10000 AS ewma
        |FROM l WHERE event_id % 20 = 0
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "ts_acf" ->
      """WITH p AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS x,
        |    lag(CAST(value AS DECIMAL(18,2))) OVER (
        |      PARTITION BY event_type ORDER BY ts ASC, event_id ASC) AS y
        |  FROM events),
        |a AS (
        |  SELECT event_type, count(1) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x*y AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x*x AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y*y AS DECIMAL(38,4))) AS DOUBLE) AS syy
        |  FROM p WHERE y IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n,
        |  floor(((CAST(n AS DOUBLE)*sxy - sx*sy) /
        |         (sqrt(CAST(n AS DOUBLE)*sxx - sx*sx) *
        |          sqrt(CAST(n AS DOUBLE)*syy - sy*sy))) * 10000 + 0.5)/10000 AS acf1
        |FROM a ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "ts_anomaly" ->
      """WITH s AS (
        |  SELECT event_type, count(1) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx
        |  FROM events GROUP BY event_type),
        |m AS (
        |  SELECT event_type,
        |    sx / CAST(n AS DOUBLE) AS mean,
        |    sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS sd
        |  FROM s)
        |SELECT event_id, e.event_type,
        |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
        |  floor(((CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) - mean) / sd) * 10000 + 0.5) / 10000 AS z
        |FROM events e JOIN m ON e.event_type = m.event_type
        |WHERE abs(CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) - mean) > 2.0 * sd
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,
    "sessionize" ->
      """WITH f AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(1) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
        |  (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS dur_s
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id ASC NULLS FIRST, session_id ASC NULLS FIRST""".stripMargin,
    "ts_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(1) AS n
        |FROM p WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type ASC NULLS FIRST, to_type ASC NULLS FIRST""".stripMargin,
    "ts_fill_forward" ->
      """WITH last_per_min AS (
        |  SELECT m, v FROM (
        |    SELECT date_trunc('minute', ts) AS m, value AS v,
        |      row_number() OVER (PARTITION BY date_trunc('minute', ts)
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click') WHERE rn = 1),
        |g AS (
        |  SELECT unnest(generate_series((SELECT min(m) FROM last_per_min),
        |                                (SELECT max(m) FROM last_per_min),
        |                                INTERVAL 1 minute)) AS m)
        |SELECT strftime(g.m, '%Y-%m-%d %H:%M:%S') AS minute,
        |  (v IS NOT NULL) AS observed,
        |  floor(last_value(v IGNORE NULLS) OVER (ORDER BY g.m
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100 AS value
        |FROM g LEFT JOIN last_per_min USING (m)
        |ORDER BY minute ASC NULLS FIRST""".stripMargin,
    "ts_interpolate" ->
      """WITH last_per_min AS (
        |  SELECT m, v FROM (
        |    SELECT date_trunc('minute', ts) AS m, value AS v,
        |      row_number() OVER (PARTITION BY date_trunc('minute', ts)
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type = 'click') WHERE rn = 1),
        |g AS (
        |  SELECT unnest(generate_series((SELECT min(m) FROM last_per_min),
        |                                (SELECT max(m) FROM last_per_min),
        |                                INTERVAL 1 minute)) AS m),
        |j AS (SELECT g.m, v FROM g LEFT JOIN last_per_min USING (m)),
        |w AS (
        |  SELECT m, v,
        |    last_value(v IGNORE NULLS) OVER (ORDER BY m
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) OVER (ORDER BY m
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pm,
        |    first_value(v IGNORE NULLS) OVER (ORDER BY m
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN m END IGNORE NULLS) OVER (ORDER BY m
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nm
        |  FROM j)
        |SELECT strftime(m, '%Y-%m-%d %H:%M:%S') AS minute,
        |  (v IS NOT NULL) AS observed,
        |  floor(CASE
        |    WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) * CAST(epoch(m) - epoch(pm) AS DOUBLE)
        |                        / CAST(epoch(nm) - epoch(pm) AS DOUBLE)
        |  END * 10000 + 0.5) / 10000 AS value
        |FROM w ORDER BY minute ASC NULLS FIRST""".stripMargin,
    "retention_cohort" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
        |  count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN f USING (user_id)
        |GROUP BY f.cohort_day, date_diff('day', cohort_day, day)
        |ORDER BY cohort_day ASC NULLS FIRST, day_offset ASC NULLS FIRST""".stripMargin,
    "ts_ohlc" ->
      """WITH b AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value,
        |    first_value(value) OVER w AS o, last_value(value) OVER w AS c
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
        |    ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  floor(min(o) * 10000 + 0.5) / 10000 AS open,
        |  floor(max(value) * 10000 + 0.5) / 10000 AS high,
        |  floor(min(value) * 10000 + 0.5) / 10000 AS low,
        |  floor(min(c) * 10000 + 0.5) / 10000 AS close,
        |  count(1) AS n
        |FROM b GROUP BY event_type, day
        |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin,
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
