package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Joins

/** Native as-of operator tests: agreement with the composed union+window
  * implementation, plan shape, and edge semantics on a hand-built case. */
class AsOfJoinSpec extends SparkTestBase {

  test("native as-of join agrees with the composed union+window as-of") {
    val native = Joins.joinAsofNative(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    val composed = Joins.joinAsof(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    assert(native.length == composed.length && native.nonEmpty)
    assert(native.toSeq == composed.toSeq)
  }

  test("hand-built case: ties, no-match, and multiple candidates") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 100L, "c_at_100"), (1L, 150L, "c_at_150"), (3L, 10L, "c_other"))
      .toDF("rk", "rt", "rtag")
    val got = AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
      .select(col("tag"), col("rtag")).collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(got == Set(
      ("p1", Some("c_at_100")), // tie: rt <= lt matches
      ("p2", Some("c_at_150")), // greatest of two candidates
      ("p3", None)))            // key with no right rows -> LEFT null
  }

  test("tolerance: boundary match kept, staler dropped to NULL, both directions") {
    import spark.implicits._
    val l = Seq((1L, 100L, "exact"), (1L, 200L, "stale"), (1L, 300L, "fresh"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 90L, "c90"), (1L, 295L, "c295")).toDF("rk", "rt", "rtag")
    // backward, tolerance 10: age<=10 matches, age 110 (200-90) does not
    val back = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", tolerance = Some(10L))
      .select(col("tag"), col("rtag")).collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(back == Set(
      ("exact", Some("c90")),  // age 10 == tolerance: inclusive bound
      ("stale", None),         // nearest candidate too old -> null-extend
      ("fresh", Some("c295"))))
    // forward, tolerance 5, right times shifted to (95, 300): the next
    // right for t=100 and t=200 is 300 (gaps 200/100, dropped); for
    // t=300 it's 300 itself (gap 0, kept)
    val fwd = AsOfJoin.asof(l, r.withColumn("rt", col("rt") + 5), "k", "rk", "t", "rt",
        direction = "forward", tolerance = Some(5L))
      .select(col("tag"), col("rtag")).collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(fwd == Set(
      ("exact", None),
      ("stale", None),
      ("fresh", Some("c295"))), s"forward tolerance: $fwd")
    // tolerance must be non-negative — construction-time failure
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "k", "rk", "t", "rt", tolerance = Some(-1L))
    }
    assert(e.getMessage.contains("tolerance"))
  }

  test("forward direction: smallest right time >= left time, ties match, none after -> NULL") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 160L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 100L, "c_at_100"), (1L, 150L, "c_at_150"), (3L, 10L, "c_other"))
      .toDF("rk", "rt", "rtag")
    val got = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", direction = "forward")
      .select(col("tag"), col("rtag")).collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(got == Set(
      ("p1", Some("c_at_100")), // tie: rt >= lt matches
      ("p2", None),             // latest right for key 1 is 150 < 160
      ("p3", None)))            // key with no right rows
  }

  test("a forward right row serves MULTIPLE earlier lefts of the same key") {
    import spark.implicits._
    val l = Seq((1L, 10L, "p1"), (1L, 20L, "p2")).toDF("k", "t", "tag")
    val r = Seq((1L, 30L, "c30")).toDF("rk", "rt", "rtag")
    val got = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", direction = "forward")
      .select(col("tag"), col("rtag")).collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(got == Set(("p1", Some("c30")), ("p2", Some("c30"))))
  }

  test("inner join type drops unmatched lefts instead of null-extending") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 100L, "c_at_100"), (1L, 150L, "c_at_150"))
      .toDF("rk", "rt", "rtag")
    val got = AsOfJoin.asof(l, r, "k", "rk", "t", "rt", joinType = "inner")
      .select(col("tag"), col("rtag")).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(got == Set(("p1", "c_at_100"), ("p2", "c_at_150"))) // p3 dropped
  }

  test("null right-side key/time rows are skipped, not coerced to 0") {
    import spark.implicits._
    // left has a legitimate key 0 / time 0 row; the right NULL rows would
    // match it if nulls unboxed to 0L (the pre-round-3 bug).
    val l = Seq((0L, 0L, "at_zero"), (1L, 10L, "one")).toDF("k", "t", "tag")
    val r = Seq(
      (None: Option[Long], Some(0L), "null_key"),
      (Some(0L), None: Option[Long], "null_time"),
      (Some(1L), Some(5L), "real"))
      .toDF("rk", "rt", "rtag")
    val got = AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
      .select(col("tag"), col("rtag")).collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(got == Set(("at_zero", None), ("one", Some("real"))))
  }

  test("int keys and timestamp times are accepted via construction-time casts") {
    import spark.implicits._
    val l = Seq((1, "2024-01-01 00:00:02", "p1"), (2, "2024-01-01 00:00:01", "p2"))
      .toDF("k", "ts", "tag").withColumn("ts", to_timestamp(col("ts")))
    val r = Seq((1, "2024-01-01 00:00:01", "q1"), (1, "2024-01-01 00:00:03", "q2"))
      .toDF("rk", "rts", "rtag").withColumn("rts", to_timestamp(col("rts")))
    val got = AsOfJoin.asof(l, r, "k", "rk", "ts", "rts")
      .select(col("tag"), col("rtag")).collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toSet
    assert(got == Set(("p1", Some("q1")), ("p2", None)))
  }

  test("mixed time unit families fail at construction with a clear message") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-01 00:00:02", "p1"))
      .toDF("k", "ts", "tag").withColumn("ts", to_timestamp(col("ts")))
    val r = Seq((1L, 5L, "q1")).toDF("rk", "rt", "rtag")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "k", "rk", "ts", "rt")
    }
    assert(e.getMessage.contains("unit family"))
  }

  test("mixed key unit families (date vs integral) fail at construction too") {
    import spark.implicits._
    // date keys normalize to epoch-days, integral keys stay raw longs —
    // comparing them would silently produce all-NULL matches
    val l = Seq(("2024-01-01", 1L, "p1")).toDF("k", "t", "tag")
      .withColumn("k", to_date(col("k")))
    val r = Seq((19723L, 1L, "q1")).toDF("rk", "rt", "rtag")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("key columns") && e.getMessage.contains("unit family"))
  }

  test("string time column fails at construction, not runtime") {
    import spark.implicits._
    val l = Seq((1L, "a", "p1")).toDF("k", "t", "tag")
    val r = Seq((1L, "b", "q1")).toDF("rk", "rt", "rtag")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("integral, date or timestamp"))
  }

  test("physical plan uses AsOfJoinExec with one shuffle per side") {
    val df = Joins.joinAsofNative(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"native exec missing from plan:\n$plan")
  }
}
