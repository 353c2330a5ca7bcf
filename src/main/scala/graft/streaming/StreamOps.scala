package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.Tables

/** Streaming-analog surface (SURVEY.md §2.B "Streaming"). Each query is
  * the BATCH-checkable analog over the `events` table — identical window
  * semantics to the Structured Streaming pipelines, so the DuckDB oracle
  * can gate them; the true incremental variants (readStream +
  * watermark / session_window / dropDuplicatesWithinWatermark) run under
  * MemoryStream in StreamingSpec, where results are asserted to match
  * these batch analogs.
  *
  * Scale notes (100 TB / unbounded):
  *  - Tumbling/sliding use Spark's `window()` — in streaming these become
  *    watermark-bounded stateful aggs whose state is |open windows| ×
  *    |keys|, constant per key; the batch analog is one hash agg shuffle.
  *  - Sessionization partitions by user_id: the lag+cumsum pass is one
  *    shuffle + per-key sort; in streaming the same semantics come from
  *    `session_window(ts, gap)` with watermark-driven state eviction.
  *  - `stream_watermark` demonstrates the closed-window rule (window.end
  *    <= max(ts) - delay): the exact rows an append-mode watermark query
  *    would have emitted.
  */
object StreamOps {
  private def t(s: SparkSession, dir: String, n: String) = Tables.t(s, dir, n)
  private def dec(c: String) = col(c).cast("decimal(18,2)")
  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** Shared plan builder: 1-hour tumbling window counts. Works unchanged
    * on a BATCH DataFrame and on a STREAMING one (readStream +
    * withWatermark) — StreamingSpec runs this very builder both ways and
    * asserts equal results. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"),
           round(sum(dec("value")), 2).cast("double").as("sum_value"))

  /** Shared plan builder: 1-hour window sliding every 15 minutes (each
    * event lands in 4 windows). Batch- and streaming-applicable. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))

  /** Batch entry: deterministic formatting + total order for the oracle. */
  def streamTumbling(spark: SparkSession, dir: String): DataFrame =
    tumblingAgg(t(spark, dir, "events"))
      .select(date_format(col("window.start"), TsFmt).as("wstart"), col("n"), col("sum_value"))
      .orderBy(col("wstart").asc)

  def streamSliding(spark: SparkSession, dir: String): DataFrame =
    slidingAgg(t(spark, dir, "events"))
      .select(date_format(col("window.start"), TsFmt).as("wstart"), col("n"))
      .orderBy(col("wstart").asc)

  /** 30-minute-gap sessionization via lag + cumulative sum — the batch
    * equivalent of `session_window(ts, "30 minutes")` per user. */
  def streamSession(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(date_format(min(col("ts")), TsFmt).as("session_start"),
           count(lit(1)).as("n_events"),
           round(sum(dec("value")), 2).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id").asc, col("session_start").asc)
  }

  /** Late-data handling: only windows closed under a 10-minute watermark
    * (window.end <= max(ts) - 10 min) are emitted — what an append-mode
    * streaming query with `withWatermark("ts", "10 minutes")` outputs. */
  def streamWatermark(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val wmRow = ev.agg((max(unix_micros(col("ts"))) - 600L * 1000000L).as("wm_us"))
    ev.groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(wmRow))
      .filter(unix_micros(col("window.end")) <= col("wm_us"))
      .select(date_format(col("window.start"), TsFmt).as("wstart"), col("n"))
      .orderBy(col("wstart").asc)
  }

  /** Stateful dedup: first event per (user_id, event_type) in event-time
    * order — batch analog of dropDuplicatesWithinWatermark keyed on
    * (user_id, event_type). */
  def streamDedupState(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id").as("first_event_id"),
              date_format(col("ts"), TsFmt).as("first_ts"))
      .orderBy(col("user_id").asc, col("event_type").asc)
  }

  /** Interval join: each click joined to the same user's views in the
    * preceding 30 minutes — the batch analog of a stream-stream inner join
    * with watermarks + a time-range condition (the true streaming variant
    * runs under MemoryStream in StreamingSpec with this exact shape). One
    * shuffle per side on user_id; in streaming the range predicate bounds
    * the join state to 30 minutes of events per key. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    clicks.join(views,
        col("user_id") === col("v_user") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("c_ts"))
      .select(col("user_id"), col("click_id"), col("view_id"),
              date_format(col("c_ts"), TsFmt).as("click_ts"),
              date_format(col("v_ts"), TsFmt).as("view_ts"))
      .orderBy(col("user_id").asc, col("click_id").asc, col("view_id").asc)
  }

  /** Stream-stream LEFT OUTER interval join (r6): every click, matched to
    * the same user's views in the preceding 30 minutes, clicks with NO
    * view surviving as NULL-padded rows — the attribution shape where
    * "unmatched" is the interesting signal (organic traffic). In batch
    * the result is the plain left join, aggregated per user so the NULL
    * accounting is the output (the DuckDB oracle). The true streaming
    * variant runs in StreamingSpec, which pins the outer-row contract: an
    * unmatched click is HELD IN STATE and its NULL row emits only after
    * the watermark passes the end of its join window — emitting earlier
    * would be wrong (a matching view could still arrive). State stays
    * bounded to the 30-minute window per key, same as the inner form. */
  def streamJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    clicks.join(views,
        col("user_id") === col("v_user") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 30 MINUTES") &&
        col("v_ts") <= col("c_ts"), "left_outer")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("view_id")).as("n_matched"),
           countDistinct(col("click_id")).as("n_clicks"))
      .orderBy(col("user_id").asc)
  }

  /** Custom stateful operator via the typed KeyValueGroupedDataset API:
    * per-user running event count with mapGroupsWithState — the escape
    * hatch when built-in windows/dedup can't express the state machine.
    * Runs in BATCH mode here (state is per-group transient, so the result
    * is the plain per-user count — DuckDB-oracled); StreamingSpec drives
    * the same state function incrementally under MemoryStream and asserts
    * state carries across micro-batches. */
  def streamCustomState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(StreamOps.countingState)
      .toDF("user_id", "n_events")
      .orderBy(col("user_id").asc)
  }

  /** The state function shared by the batch query and the MemoryStream
    * test: accumulate a per-key Long count across invocations. */
  private[graft] def countingState(
      user: Long, events: Iterator[(Long, Long)],
      state: org.apache.spark.sql.streaming.GroupState[Long]): (Long, Long) = {
    val n = state.getOption.getOrElse(0L) + events.size
    state.update(n)
    (user, n)
  }

  /** Streaming heavy hitters (r5): the Misra–Gries sketch as PER-BUCKET
    * mapGroupsWithState state. Terms are bucketed by `hash(term) mod 8` so
    * state is parallel (8 independent sketches, O(k) each — NEVER one
    * driver-side sketch) and a term always lands in the same bucket, so
    * the per-bucket guarantee (in-bucket freq > n_b/(k+1) survives)
    * implies the global one (global freq > n/(k+1) ⇒ survives). Batch
    * mode = one state invocation per bucket; StreamingSpec drives the
    * same state function across micro-batches and asserts the sketch
    * state carries. Candidates are then exactly recounted and thresholded
    * (count·30 > total) — the identical deterministic contract, and the
    * identical oracle, as the batch `agg_heavy_hitters`. */
  def streamHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val tok = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
    val cands = tok
      .select(pmod(hash(col("term")), lit(8)).cast("int").as("bucket"), col("term"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(StreamOps.hhState)
      .flatMap(_._2)
      .toDF("term").distinct()
    val total = tok.agg(count(lit(1)).as("total"))
    tok.join(broadcast(cands), "term")
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * 30 > col("total"))
      .select(col("term"), col("n"))
      .orderBy(col("term").asc)
  }

  /** Per-user running stats via the Spark 4 arbitrary-state API (r5):
    * `transformWithState` + `StatefulProcessor` with named, typed
    * `ValueState` slots — the successor to mapGroupsWithState (multiple
    * independently-evolvable state variables, per-variable TTL, timers,
    * and RocksDB-backed stores with changelog checkpointing in streaming
    * — the state no longer has to fit an executor's heap). Batch mode =
    * one invocation per key, so the result is the plain per-user
    * (count, exact cents sum) — DuckDB-oracled; StreamingSpec drives the
    * same processor incrementally under the RocksDB provider and asserts
    * the ValueState carries across micro-batches. Values accumulate as
    * floor(v·100+0.5) cents BIGINTs — exact, order-independent. */
  def streamTransformState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    // batch TWS loads RocksDB stores that report to the driver
    // coordinator; create the endpoint if no streaming query did yet
    org.apache.spark.sql.graftbridge.SqlBridge.ensureStateStoreCoordinator(spark)
    t(spark, dir, "events")
      .select(col("user_id"), col("value"), col("ts"))
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new StreamOps.UserStatsProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "n_events", "sum_cents")
      .orderBy(col("user_id").asc)
  }

  /** StatefulProcessor shared by the batch query and the MemoryStream
    * tests: two named ValueState slots (count, cents sum) folded per
    * invocation and emitted as the running totals.
    *
    * r7: with `TimeMode.EventTime` and `idleGapMs > 0` the processor also
    * exercises the TIMER half of the new state API — the feature that
    * justifies it over mapGroupsWithState: each input batch re-arms ONE
    * event-time timer per key at max(event time) + gap (deleting the
    * previous deadline — the idle clock restarts with activity), and when
    * the WATERMARK crosses the deadline `handleExpiredTimer` emits an
    * eviction tombstone `(user, -n, -cents)` and clears both slots — at
    * 100 TB this is what bounds state to ACTIVE keys instead of all keys
    * ever seen. Batch mode (`TimeMode.None`) registers no timers, so the
    * oracle-checked output is unchanged. */
  private[graft] class UserStatsProcessor(
      idleGapMs: Long = 0L,
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double, java.sql.Timestamp), (Long, Long, Long)] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, ValueState}
    @transient private var nState: ValueState[Long] = _
    @transient private var centsState: ValueState[Long] = _
    @transient private var armTimers: Boolean = false
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // per-variable TTL (r7): with a TTLConfig the store evicts a key's
      // value ttlDuration after its last UPDATE (processing time) — the
      // declarative state bound for "forget inactive keys" when no
      // event-time watermark exists; the timer path above is the
      // event-time-precise alternative. Batch + oracle use TTLConfig.NONE.
      nState = getHandle.getValueState[Long](
        "n", org.apache.spark.sql.Encoders.scalaLong, ttl)
      centsState = getHandle.getValueState[Long](
        "cents", org.apache.spark.sql.Encoders.scalaLong, ttl)
      armTimers = idleGapMs > 0 && timeMode == TimeMode.EventTime()
    }
    override def handleInputRows(
        user: Long, rows: Iterator[(Long, Double, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
      var n = if (nState.exists()) nState.get() else 0L
      var cents = if (centsState.exists()) centsState.get() else 0L
      var maxTs = Long.MinValue
      rows.foreach { r =>
        n += 1
        cents += math.floor(r._2 * 100 + 0.5).toLong
        if (r._3 != null) maxTs = math.max(maxTs, r._3.getTime)
      }
      nState.update(n)
      centsState.update(cents)
      if (armTimers && maxTs != Long.MinValue) {
        getHandle.listTimers().foreach(getHandle.deleteTimer) // one live deadline per key
        getHandle.registerTimer(maxTs + idleGapMs)
      }
      Iterator.single((user, n, cents))
    }
    override def handleExpiredTimer(
        user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
      val n = if (nState.exists()) nState.get() else 0L
      val cents = if (centsState.exists()) centsState.get() else 0L
      nState.clear()
      centsState.clear()
      Iterator.single((user, -n, -cents)) // eviction tombstone: final totals, negated
    }
  }

  /** `stream_tws_list_map` (r7): the remaining two state primitives of
    * the transformWithState API — ListState (the 3 most recent events
    * per user, bounded: put() replaces, so state is O(3) per key forever)
    * and MapState (per-user event-type counts — point lookups and
    * per-entry updates without rewriting a whole value). Batch mode
    * (TimeMode.None) makes it oracle-checkable exactly like
    * stream_transform_state; the streaming spec pins that the list
    * carries across micro-batches. */
  def streamTwsListMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    org.apache.spark.sql.graftbridge.SqlBridge.ensureStateStoreCoordinator(spark)
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("value"), col("ts"))
      .as[(Long, Long, String, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new StreamOps.RecentMixProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "recent3_cents", "n_types", "top_type")
      .orderBy(col("user_id").asc)
  }

  /** StatefulProcessor over ListState + MapState: keeps the 3 most recent
    * (ts, event_id)-ordered events' cents in a ListState and the per-type
    * counts in a MapState; emits (user, Σ recent-3 cents, #types, most
    * frequent type — ties broken lexicographically, so deterministic). */
  private[graft] class RecentMixProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, String, Double, java.sql.Timestamp),
        (Long, Long, Long, String)] {
    import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders
    @transient private var recent: ListState[(Long, Long, Long)] = _ // (tsUs, eventId, cents)
    @transient private var byType: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[(Long, Long, Long)]("recent",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long]("byType",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(
        user: Long, rows: Iterator[(Long, Long, String, Double, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, String)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      recent.get().foreach(buf += _)
      rows.foreach { r =>
        // TRUE microsecond key (r8, ADVICE r7 #3): getTime() alone is
        // millisecond-truncated, so two events of one user differing
        // only sub-millisecond could rank differently than the oracle's
        // full-µs ORDER BY and flip the recent-3 set
        val tsUs =
          if (r._5 == null) Long.MinValue
          else Math.floorDiv(r._5.getTime, 1000L) * 1000000L + r._5.getNanos / 1000L
        buf += ((tsUs, r._2, math.floor(r._4 * 100 + 0.5).toLong))
        val prev = if (byType.containsKey(r._3)) byType.getValue(r._3) else 0L
        byType.updateValue(r._3, prev + 1L)
      }
      // most recent first: (ts, event_id) desc via a REVERSE Ordering —
      // sortBy(-t) overflows for the null sentinel (-Long.MinValue ==
      // Long.MinValue), which sorted null-ts rows as MOST recent
      val top3 = buf.sorted(
        Ordering.Tuple2[Long, Long].on[(Long, Long, Long)](t => (t._1, t._2)).reverse)
        .take(3).toArray
      recent.put(top3)
      var nTypes = 0L
      var topType: String = null
      var topN = -1L
      byType.iterator().foreach { case (k, v) =>
        nTypes += 1
        if (v > topN || (v == topN && k < topType)) {
          topType = k; topN = v
        }
      }
      Iterator.single((user, top3.map(_._3).sum, nTypes, topType))
    }
  }

  /** Session tracking via flatMapGroupsWithState (r5): the 1→N stateful
    * escape hatch — unlike mapGroupsWithState's one-row-per-key contract,
    * each invocation emits ZERO OR MORE closed sessions (6 h gap rule,
    * same as `sessionize`) and keeps the still-open session in state.
    * Append-mode semantics make the batch result exactly "every session
    * CLOSED by a later event" — each user's final session is still open
    * at end-of-input (on an unbounded stream it genuinely is), so the
    * oracle excludes each user's last session. The streaming variant sets
    * an event-time timeout of lastTs+gap so the watermark closes idle
    * sessions; StreamingSpec drives the same state function across
    * micro-batches and asserts timeout-driven emission. State per key is
    * ONE (start, last, n) triple — O(users) state at 100 TB, evicted on
    * close. */
  def streamFlatmapState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    t(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        StreamOps.sessionFlatState(useTimeout = false))
      .toDF("user_id", "s_us", "e_us", "n_events")
      .select(col("user_id"),
              date_format(timestamp_micros(col("s_us")), TsFmt).as("start_ts"),
              date_format(timestamp_micros(col("e_us")), TsFmt).as("end_ts"),
              col("n_events"))
      .orderBy(col("user_id").asc, col("start_ts").asc)
  }

  /** Session state transition shared by the batch query and the
    * MemoryStream test. Rows are (user_id, ts_micros); state is the open
    * session (start, last, n). A timed-out invocation (streaming only)
    * emits the open session and clears state; otherwise the batch's
    * events fold in ts order, emitting every session closed by a > 6 h
    * gap. `useTimeout` gates the event-time timeout registration — batch
    * mode runs without a watermark, where setTimeoutTimestamp is
    * unsupported. */
  private[graft] def sessionFlatState(useTimeout: Boolean)(
      user: Long, rows: Iterator[(Long, Long)],
      state: org.apache.spark.sql.streaming.GroupState[(Long, Long, Long)])
      : Iterator[(Long, Long, Long, Long)] = {
    val GapUs = 6L * 3600 * 1000000
    if (!rows.hasNext && state.hasTimedOut) {
      val (s0, last, n) = state.get
      state.remove()
      return Iterator.single((user, s0, last, n))
    }
    val ts = rows.map(_._2).toArray.sorted
    val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var cur = state.getOption
    ts.foreach { tUs =>
      cur match {
        case Some((s0, last, n)) =>
          if (tUs - last > GapUs) {
            closed += ((user, s0, last, n))
            cur = Some((tUs, tUs, 1L))
          } else cur = Some((s0, math.max(last, tUs), n + 1))
        case None => cur = Some((tUs, tUs, 1L))
      }
    }
    cur.foreach { c =>
      state.update(c)
      if (useTimeout) state.setTimeoutTimestamp(c._2 / 1000 + GapUs / 1000)
    }
    closed.iterator
  }

  /** Per-bucket Misra–Gries state transition, shared with the
    * MemoryStream test: fold this invocation's terms into the carried
    * ≤ k-counter sketch via the same kernels the batch
    * `TypedImperativeAggregate` runs (functions/MisraGries.scala). */
  private[graft] def hhState(
      bucket: Int, rows: Iterator[(Int, String)],
      state: org.apache.spark.sql.streaming.GroupState[Map[String, Long]]): (Int, Seq[String]) = {
    val k = 30
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    state.getOption.foreach(m => buf ++= m)
    rows.foreach(r => graft.functions.MisraGriesAgg.add(buf, r._2, k))
    state.update(buf.toMap)
    (bucket, buf.keys.toSeq.sorted)
  }

  /** Deployable Structured Streaming entry point: watch a GROWING directory
    * of parquet event files (the capture-roll / event-log refill use case)
    * and maintain the same 1-hour tumbling aggregate as the batch path —
    * the identical `tumblingAgg` plan builder, under a 10-minute watermark
    * in append mode, writing closed windows to a parquet sink with exactly-
    * once checkpointing. New files dropped into `inputDir` are picked up on
    * the next trigger; at scale parallelism is file count per micro-batch.
    *
    * `schema` is the event schema (file sources require one up front;
    * must contain `ts: timestamp` and `value`). */
  def startFilePipeline(spark: SparkSession, inputDir: String, outDir: String,
                        checkpointDir: String, schema: StructType): StreamingQuery = {
    val events = spark.readStream.schema(schema).parquet(inputDir)
      .withWatermark("ts", "10 minutes")
    tumblingAgg(events)
      .select(date_format(col("window.start"), TsFmt).as("wstart"),
              col("n"), col("sum_value"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }

  /** foreachBatch sink + Trigger.AvailableNow — the two workhorses of
    * production Structured Streaming deployments:
    *
    *  - `foreachBatch` hands each micro-batch to the FULL batch writer
    *    surface. Exactly-once lands via idempotent, batchId-keyed writes:
    *    a re-delivered batch (failure between sink write and checkpoint
    *    commit) overwrites its own `batch_id=N` directory instead of
    *    duplicating — the pattern every JDBC/Delta/multi-sink pipeline
    *    uses.
    *  - `AvailableNow` drains the existing backlog in bounded micro-batches
    *    and STOPS — backfill/catch-up over a directory without either a
    *    forever-running query or a divergent "batch version of the job".
    *
    * StreamingSpec drives it over real files and asserts drain-and-stop,
    * batch-vs-stream row equality, and restart idempotence (a second run
    * over the same checkpoint emits nothing new). */
  def startForeachBatchPipeline(spark: SparkSession, inputDir: String, outDir: String,
                                checkpointDir: String, schema: StructType): StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> (streamTumbling _),
    "stream_sliding" -> (streamSliding _),
    "stream_session" -> (streamSession _),
    "stream_watermark" -> (streamWatermark _),
    "stream_join" -> (streamJoin _),
    "stream_join_outer" -> (streamJoinOuter _),
    "stream_custom_state" -> (streamCustomState _),
    "stream_transform_state" -> (streamTransformState _),
    "stream_tws_list_map" -> (streamTwsListMap _),
    "stream_flatmap_state" -> (streamFlatmapState _),
    "stream_heavy_hitters" -> (streamHeavyHitters _),
    "stream_dedup_state" -> (streamDedupState _))

  val oracle: Map[String, String] = Map(
    "stream_join_outer" ->
      """SELECT user_id, count(1) AS n_rows, count(view_id) AS n_matched,
        |  count(DISTINCT click_id) AS n_clicks
        |FROM (SELECT user_id, event_id AS click_id, ts AS c_ts
        |      FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT user_id AS v_user, event_id AS view_id, ts AS v_ts
        |           FROM events WHERE event_type = 'view') v
        |  ON user_id = v_user
        | AND v_ts >= c_ts - INTERVAL 30 MINUTE AND v_ts <= c_ts
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "stream_tws_list_map" ->
      """WITH c AS (
        |  SELECT user_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |r3 AS (
        |  SELECT user_id, CAST(sum(cents) AS BIGINT) AS recent3_cents
        |  FROM c WHERE rn <= 3 GROUP BY user_id),
        |t AS (
        |  SELECT user_id, event_type, count(1) AS n
        |  FROM events GROUP BY user_id, event_type),
        |nt AS (SELECT user_id, count(1) AS n_types FROM t GROUP BY user_id),
        |top AS (
        |  SELECT user_id, event_type AS top_type FROM (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY n DESC, event_type ASC) AS rk
        |    FROM t) WHERE rk = 1)
        |SELECT r3.user_id, r3.recent3_cents, nt.n_types, top.top_type
        |FROM r3
        |JOIN nt ON r3.user_id = nt.user_id
        |JOIN top ON r3.user_id = top.user_id
        |ORDER BY r3.user_id ASC NULLS FIRST""".stripMargin,
    "stream_transform_state" ->
      """SELECT user_id, count(1) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "stream_flatmap_state" ->
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
        |  FROM f),
        |agg AS (
        |  SELECT user_id, session_id, count(1) AS n_events,
        |    min(ts) AS lo, max(ts) AS hi
        |  FROM s GROUP BY user_id, session_id),
        |mx AS (SELECT user_id, max(session_id) AS last_s FROM agg GROUP BY user_id)
        |SELECT a.user_id,
        |  strftime(lo, '%Y-%m-%d %H:%M:%S') AS start_ts,
        |  strftime(hi, '%Y-%m-%d %H:%M:%S') AS end_ts,
        |  n_events
        |FROM agg a JOIN mx ON a.user_id = mx.user_id
        |WHERE a.session_id < mx.last_s
        |ORDER BY a.user_id ASC NULLS FIRST, start_ts ASC NULLS FIRST""".stripMargin,
    "stream_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tot AS (SELECT count(1) AS total FROM tok)
        |SELECT term, count(1) AS n
        |FROM tok CROSS JOIN tot
        |GROUP BY term, total
        |HAVING count(1) * 30 > total
        |ORDER BY term ASC NULLS FIRST""".stripMargin,
    "stream_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
        |  count(1) AS n,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY wstart ASC NULLS FIRST""".stripMargin,
    "stream_sliding" ->
      """SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS wstart,
        |  count(1) AS n
        |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
        |GROUP BY 1 ORDER BY wstart ASC NULLS FIRST""".stripMargin,
    "stream_session" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id
        |                           ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g
        |)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(1) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST""".stripMargin,
    "stream_watermark" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart, count(1) AS n
        |FROM events
        |GROUP BY date_trunc('hour', ts)
        |HAVING epoch_us(date_trunc('hour', ts) + INTERVAL '1 hour')
        |       <= (SELECT max(epoch_us(ts)) - 600000000 FROM events)
        |ORDER BY wstart ASC NULLS FIRST""".stripMargin,
    "stream_custom_state" ->
      """SELECT user_id, count(1) AS n_events FROM events
        |GROUP BY user_id ORDER BY user_id ASC NULLS FIRST""".stripMargin,
    "stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
        |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts >= c.ts - INTERVAL '30 minutes' AND v.ts <= c.ts
        |ORDER BY c.user_id ASC NULLS FIRST, click_id ASC NULLS FIRST, view_id ASC NULLS FIRST""".stripMargin,
    "stream_dedup_state" ->
      """SELECT user_id, event_type, first_event_id, first_ts FROM (
        |  SELECT user_id, event_type, event_id AS first_event_id,
        |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin)
}
