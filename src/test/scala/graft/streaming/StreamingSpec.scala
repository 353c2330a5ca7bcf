package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** True Structured Streaming variants of the `stream_*` batch analogs,
  * driven by MemoryStream (SURVEY.md §2.B "Streaming", §7 M4). Each test
  * asserts the incremental result matches the batch semantics the DuckDB
  * oracle already gates. */
class StreamingSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val sample = Seq(
    (1L, ts("2024-01-01 00:05:00"), 10.0),
    (2L, ts("2024-01-01 00:20:00"), 20.0),
    (3L, ts("2024-01-01 01:10:00"), 30.0),
    (4L, ts("2024-01-01 02:40:00"), 40.0),
    (5L, ts("2024-01-01 03:59:00"), 50.0))

  test("streaming tumbling window agg matches batch window() result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    mem.addData(sample: _*)
    // the SAME StreamOps.tumblingAgg builder runs the streaming pipeline…
    val q = StreamOps.tumblingAgg(
        mem.toDF().toDF("event_id", "ts", "value").withWatermark("ts", "10 minutes"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("tumbling_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("tumbling_out")
      .select($"window.start".cast("string"), $"n", $"sum_value").collect().toSet
    // …and the batch one; results must be identical
    val batch = StreamOps.tumblingAgg(
        spark.createDataset(sample).toDF("event_id", "ts", "value"))
      .select($"window.start".cast("string"), $"n", $"sum_value").collect().toSet
    assert(streamed == batch && batch.size == 4)
  }

  test("streaming dropDuplicatesWithinWatermark dedups within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData(
      (1L, ts("2024-01-01 00:00:00"), "click"),
      (1L, ts("2024-01-01 00:01:00"), "click"), // dup key within watermark
      (2L, ts("2024-01-01 00:02:00"), "view"),
      (1L, ts("2024-01-01 00:03:00"), "view"))
    val q = mem.toDF().toDF("user_id", "ts", "event_type")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_out").select($"user_id", $"event_type").collect().toSet
    assert(got.map(r => (r.getLong(0), r.getString(1))) ==
      Set((1L, "click"), (2L, "view"), (1L, "view")))
  }

  test("session_window built-in agrees with the lag+cumsum batch sessionizer") {
    import spark.implicits._
    // built-in session_window over the real events table
    val ev = graft.Tables.t(spark, sfDir, "events")
    val builtIn = ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss").as("session_start"), $"n_events")
    val analog = StreamOps.streamSession(spark, sfDir)
      .select($"user_id", $"session_start", $"n_events")
    assert(builtIn.exceptAll(analog).isEmpty && analog.exceptAll(builtIn).isEmpty)
  }

  test("file-source pipeline over a growing directory emits closed windows (append mode)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream-files").toFile.getAbsolutePath
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    // real event rows, ts-ordered, delivered as two parquet file drops —
    // the capture-roll / growing-log deployment the reference's refill
    // loop serves
    val rows = graft.Tables.t(spark, sfDir, "events")
      .select($"event_id".cast("long"), $"ts", $"value".cast("double"))
      .orderBy($"ts".asc, $"event_id".asc)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val (c1, c2) = rows.splitAt((rows.length * 7) / 10)
    spark.createDataset(c1.toSeq).toDF("event_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(inDir)
    val q = StreamOps.startFilePipeline(spark, inDir, outDir, ckpt,
      spark.read.parquet(inDir).schema)
    q.processAllAvailable()
    spark.createDataset(c2.toSeq).toDF("event_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(inDir) // the directory GROWS
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getAs[String]("wstart"),
                           (r.getAs[Long]("n"), r.getAs[Double]("sum_value")))).toMap
    val batch = StreamOps.streamTumbling(spark, sfDir)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.nonEmpty, "pipeline emitted nothing")
    // every emitted (closed) window must equal the batch result exactly
    got.foreach { case (w, v) =>
      assert(batch(w) == v, s"window $w: streamed $v, batch ${batch(w)}") }
    // windows already closed by chunk 1's watermark must all have been emitted
    def epochUtc(s: String): Long = java.time.LocalDateTime
      .parse(s.replace(' ', 'T')).toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val wm1 = c1.last._2.getTime - 600000L // max(ts) - 10 min
    val mustHave = batch.keySet.filter(w => epochUtc(w) + 3600000L <= wm1)
    assert(mustHave.subsetOf(got.keySet),
      s"closed windows missing from sink: ${mustHave -- got.keySet}")
  }

  test("foreachBatch + AvailableNow: drains the backlog, stops, restart is idempotent") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream-feb").toFile.getAbsolutePath
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val src = graft.Tables.t(spark, sfDir, "events")
      .select($"event_id".cast("long"), $"user_id".cast("long"),
              $"event_type", $"value".cast("double"))
    src.coalesce(2).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val q = StreamOps.startForeachBatchPipeline(spark, inDir, outDir, ckpt, schema)
    q.awaitTermination(60000) // AvailableNow must terminate ON ITS OWN
    assert(!q.isActive, "AvailableNow query did not stop after draining the backlog")
    def readOut() = spark.read.parquet(s"$outDir/batch_id=*")
    assert(readOut().count() == src.count(), "foreachBatch sink lost or duplicated rows")
    // restart over the SAME checkpoint with no new input: nothing re-emitted,
    // nothing duplicated (idempotence is batchId-keyed overwrite + offsets)
    val q2 = StreamOps.startForeachBatchPipeline(spark, inDir, outDir, ckpt, schema)
    q2.awaitTermination(60000)
    assert(!q2.isActive)
    assert(readOut().count() == src.count(), "restart duplicated batches")
    // and the sink content matches the batch source exactly, not just by count
    val got = readOut().select($"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = src.select($"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected)
  }

  test("mapGroupsWithState carries per-key state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val mem = MemoryStream[(Long, Long)]
    mem.addData((1L, 10L), (1L, 11L), (2L, 20L))
    val q = mem.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(StreamOps.countingState)
      .toDF("user_id", "n_events")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("state_out").start()
    q.processAllAvailable()
    mem.addData((1L, 12L)) // second batch: user 1's count must RESUME at 2
    q.processAllAvailable(); q.stop()
    val rows = spark.table("state_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 2L), (2L, 1L), (1L, 3L)))
  }

  test("transformWithState: ValueState persists across micro-batches under RocksDB (Spark 4 state API)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.TimeMode
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    // transformWithState requires the RocksDB provider in streaming —
    // the state API that stops requiring state to fit the JVM heap
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val mem = MemoryStream[(Long, Double, java.sql.Timestamp)]
      mem.addData((1L, 10.0, ts(1)), (1L, 20.0, ts(2)), (2L, 5.0, ts(3)))
      val q = mem.toDS().groupByKey(_._1)
        .transformWithState(new StreamOps.UserStatsProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_events", "sum_cents")
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("tws_out").start()
      q.processAllAvailable()
      mem.addData((1L, 30.0, ts(4))) // batch 2: user 1 must RESUME at (2, 3000)
      q.processAllAvailable(); q.stop()
      val rows = spark.table("tws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 2L, 3000L), (2L, 1L, 500L), (1L, 3L, 6000L)), rows)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState: ListState and MapState carry across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.TimeMode
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val mem = MemoryStream[(Long, Long, String, Double, java.sql.Timestamp)]
      // batch 1: two clicks at t=1,2 (cents 100, 200)
      mem.addData((1L, 1L, "click", 1.0, ts(1)), (1L, 2L, "click", 2.0, ts(2)))
      val q = mem.toDS().groupByKey(_._1)
        .transformWithState(new StreamOps.RecentMixProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "recent3_cents", "n_types", "top_type")
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("tws_lm_out").start()
      q.processAllAvailable()
      // batch 2: two views at t=3,4 — the recent-3 must MERGE batch-1's
      // list with these (keep t=4,3,2 → cents 400+300+200), and the map
      // must see 2 clicks vs 2 views (tie → lexicographic: "click")
      mem.addData((1L, 3L, "view", 3.0, ts(3)), (1L, 4L, "view", 4.0, ts(4)))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("tws_lm_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(rows == Set(
        (1L, 300L, 1L, "click"),   // batch 1: 100+200, one type
        (1L, 900L, 2L, "click")),  // batch 2: 400+300+200, tie → "click"
        s"list/map state must persist: $rows")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState: event-time timer evicts idle keys across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.TimeMode
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      val mem = MemoryStream[(Long, Double, java.sql.Timestamp)]
      mem.addData((1L, 10.0, ts(10))) // deadline armed at 10s + 5s = 15s
      val q = mem.toDS().toDF("user_id", "value", "ts")
        .withWatermark("ts", "2 seconds")
        .as[(Long, Double, java.sql.Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new StreamOps.UserStatsProcessor(idleGapMs = 5000L),
          TimeMode.EventTime(), OutputMode.Update())
        .toDF("user_id", "n_events", "sum_cents")
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("tws_timer_out").start()
      q.processAllAvailable()
      // watermark → 28s, past user 1's 15s deadline; the watermark-advance
      // batch plus a nudge batch give the timer a batch to fire in
      mem.addData((2L, 7.0, ts(30)))
      q.processAllAvailable()
      mem.addData((2L, 8.0, ts(31)))
      q.processAllAvailable()
      val afterEvict = spark.table("tws_timer_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(afterEvict.contains((1L, -1L, -1000L)),
        s"timer must fire an eviction tombstone for idle user 1: ${afterEvict.toSeq}")
      // user 1 returns AFTER eviction: state was cleared, so the count
      // restarts at 1 instead of resuming at 2
      mem.addData((1L, 40.0, ts(32)))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("tws_timer_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.count(_ == ((1L, 1L, 1000L))) == 1, // batch-1 running total
        s"unexpected duplicate of the pre-eviction row: ${rows.toSeq}")
      assert(rows.contains((1L, 1L, 4000L)),
        s"returning user must restart from cleared state: ${rows.toSeq}")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState: per-variable TTL evicts state between micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig}
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ts(s: Long) = new java.sql.Timestamp(s * 1000)
      // ProcessingTime TimeMode makes the operator request a follow-up
      // batch every time the clock advances (that's how TTL state gets
      // swept), so the query NEVER drains: processAllAvailable hangs and
      // even Trigger.AvailableNow keeps constructing sweep batches (270
      // epochs in 60 s, measured). Never wait for drain — poll the sink
      // for the expected row, then stop() the still-running query.
      val mem = MemoryStream[(Long, Double, java.sql.Timestamp)]
      val q = mem.toDS().groupByKey(_._1)
        .transformWithState(
          new StreamOps.UserStatsProcessor(
            ttl = TTLConfig(java.time.Duration.ofMillis(600))),
          TimeMode.ProcessingTime(), OutputMode.Update())
        .toDF("user_id", "n_events", "sum_cents")
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("tws_ttl_out").start()
      def rows(): Seq[(Long, Long, Long)] = spark.table("tws_ttl_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      def awaitRow(want: (Long, Long, Long)): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (!rows().contains(want)) {
          assert(System.nanoTime() < deadline, s"no $want in 30s: ${rows()}")
          Thread.sleep(100)
        }
      }
      try {
        mem.addData((1L, 10.0, ts(1)))
        awaitRow((1L, 1L, 1000L))
        Thread.sleep(1200) // let the 600ms TTL lapse in processing time
        mem.addData((1L, 20.0, ts(2)))
        // TTL evicted the value between micro-batches: the count RESTARTS
        // at 1 with only the second event's cents — not (2, 3000)
        awaitRow((1L, 1L, 2000L))
        assert(!rows().contains((1L, 2L, 3000L)),
          s"state survived past its TTL: ${rows()}")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream_heavy_hitters: Misra-Gries state carries across micro-batches and keeps the guarantee") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.GroupStateTimeout
    // one bucket (key 0), k=30: feed 40 distinct light terms over two
    // batches around a heavy term whose global freq (24 of 104 > n/31)
    // guarantees survival even though the sketch must evict to admit it
    val b1 = (1 to 20).map(i => (0, f"light_a_$i%02d")) ++ Seq.fill(10)((0, "hot"))
    val b2 = (1 to 40).map(i => (0, f"light_b_$i%02d")) ++ Seq.fill(14)((0, "hot")) ++
      (1 to 20).map(i => (0, f"light_a_$i%02d"))
    val mem = MemoryStream[(Int, String)]
    mem.addData(b1: _*)
    val q = mem.toDS().groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(StreamOps.hhState)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("hh_state_out").start()
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable(); q.stop()
    val batches = spark.table("hh_state_out").collect()
      .map(r => r.getSeq[String](1).toSet)
    assert(batches.length == 2, s"expected one sketch emission per micro-batch: ${batches.length}")
    // state carried: batch-2 candidates reflect batch-1 counts — "hot"
    // (24/104 total, above n/31) must be present after batch 2, and the
    // sketch stayed bounded
    assert(batches.last.contains("hot"), s"heavy hitter evicted: ${batches.last}")
    assert(batches.forall(_.size <= 30))
  }

  test("flatMapGroupsWithState: gap closes sessions in-batch, event-time timeout closes idle ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val mem = MemoryStream[(Long, Timestamp)]
    // batch 1: user 1 has a 2-event session then a 9h-later event — the
    // gap rule must close session 1 within the batch
    mem.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 01:00:00")),
                (1L, ts("2024-01-01 10:00:00")))
    // the watermarked ts column must stay in the stateful operator's
    // input (Spark rejects EventTimeTimeout otherwise); the adapter strips
    // it before handing rows to the SAME shared state function
    val fn: (Long, Iterator[(Long, Long, Timestamp)],
             org.apache.spark.sql.streaming.GroupState[(Long, Long, Long)])
            => Iterator[(Long, Long, Long, Long)] =
      (k, rows, st) =>
        StreamOps.sessionFlatState(useTimeout = true)(k, rows.map(r => (r._1, r._2)), st)
    val q = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .select($"user_id", unix_micros($"ts").as("us"), $"ts")
      .as[(Long, Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
      .toDF("user_id", "s_us", "e_us", "n_events")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("fmgs_out").start()
    q.processAllAvailable()
    // after batch 1 (watermark 10:00 < the 16:00 timeout) only the
    // gap-closed session has been emitted
    val afterB1 = spark.table("fmgs_out").count()
    // batch 2 advances the watermark to 20:00 > 16:00 — the watermark-
    // change follow-up batch fires user 1's idle-session timeout and
    // EMITS it; user 2's open session (timeout 02:00 next day) does not
    mem.addData((2L, ts("2024-01-01 20:00:00")))
    q.processAllAvailable(); q.stop()
    def us(s: String) = ts(s).getTime * 1000L
    val got = spark.table("fmgs_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(afterB1 == 1, s"gap-closed session must be the only batch-1 emission, got $afterB1")
    assert(got == Set(
      (1L, us("2024-01-01 00:00:00"), us("2024-01-01 01:00:00"), 2L),
      (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:00:00"), 1L)), got)
  }

  test("stream-stream interval join matches the in-memory reference") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clickRows = Seq( // (user, click_id, ts)
      (1L, 100L, ts("2024-01-01 01:00:00")),
      (1L, 101L, ts("2024-01-01 02:00:00")),
      (2L, 102L, ts("2024-01-01 01:30:00")))
    val viewRows = Seq( // (user, view_id, ts)
      (1L, 200L, ts("2024-01-01 00:45:00")), // 15 min before click 100: match
      (1L, 201L, ts("2024-01-01 00:20:00")), // 40 min before click 100: too old
      (1L, 202L, ts("2024-01-01 01:59:00")), // 1 min before click 101: match
      (2L, 203L, ts("2024-01-01 01:35:00")), // AFTER click 102: no match
      (3L, 204L, ts("2024-01-01 01:00:00"))) // no clicks for user 3
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    clicks.addData(clickRows: _*)
    views.addData(viewRows: _*)
    val joined = clicks.toDF().toDF("user_id", "click_id", "c_ts")
      .withWatermark("c_ts", "1 hour")
      .join(views.toDF().toDF("v_user", "view_id", "v_ts").withWatermark("v_ts", "1 hour"),
        expr("user_id = v_user AND v_ts >= c_ts - INTERVAL 30 MINUTES AND v_ts <= c_ts"))
    val q = joined.select($"click_id", $"view_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("join_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("join_out").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (cu, cid, cts) <- clickRows
      (vu, vid, vts) <- viewRows
      if cu == vu && !vts.after(cts) && vts.getTime >= cts.getTime - 1800000L
    } yield (cid, vid)).toSet
    assert(got == expected && expected == Set((100L, 200L), (101L, 202L)))
  }

  test("stream-stream LEFT OUTER interval join: NULL row emits only after the watermark closes its window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val views = MemoryStream[(Long, Long, Timestamp)]
    val joined = clicks.toDF().toDF("user_id", "click_id", "c_ts")
      .withWatermark("c_ts", "10 minutes")
      .join(views.toDF().toDF("v_user", "view_id", "v_ts")
              .withWatermark("v_ts", "10 minutes"),
        expr("user_id = v_user AND v_ts >= c_ts - INTERVAL 30 MINUTES AND v_ts <= c_ts"),
        "left_outer")
    val q = joined.select($"click_id", $"view_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ljoin_out").start()
    // batch 1: click 100 has a matching view; click 101 has none (yet?)
    clicks.addData((1L, 100L, ts("2024-01-01 01:00:00")),
                   (2L, 101L, ts("2024-01-01 01:00:00")))
    views.addData((1L, 200L, ts("2024-01-01 00:50:00")))
    q.processAllAvailable()
    def rows() = spark.table("ljoin_out").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet
    // the matched row emits immediately; the unmatched click MUST NOT —
    // a matching view could still arrive within its 30-minute window
    assert(rows() == Set((100L, Some(200L))), rows())
    // advance BOTH watermarks far past click 101's window, then nudge one
    // more micro-batch so the state eviction (decided on watermark advance)
    // actually runs
    clicks.addData((9L, 900L, ts("2024-01-01 03:00:00")))
    views.addData((9L, 901L, ts("2024-01-01 03:00:00")))
    q.processAllAvailable()
    clicks.addData((9L, 902L, ts("2024-01-01 03:30:00")))
    views.addData((9L, 903L, ts("2024-01-01 03:30:00")))
    q.processAllAvailable(); q.stop()
    assert(rows().contains((101L, None)),
      s"outer NULL row never emitted after watermark passed: ${rows()}")
  }

  test("streaming sliding window assigns each event to 4 windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    mem.addData((1L, ts("2024-01-01 00:07:00")))
    val q = StreamOps.slidingAgg(
        mem.toDF().toDF("event_id", "ts").withColumn("value", lit(1.0))
          .withWatermark("ts", "1 minute"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("sliding_out").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("sliding_out").count() == 4)
  }
}
