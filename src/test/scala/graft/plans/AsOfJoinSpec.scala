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

  test("physical plan uses AsOfJoinExec with one shuffle per side") {
    val df = Joins.joinAsofNative(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"native exec missing from plan:\n$plan")
  }
}
