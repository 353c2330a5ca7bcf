package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native AS-OF join operator — the (c) tier of the custom-operator
  * preference order (SURVEY.md §4.3): a LogicalPlan node, a planner
  * Strategy and a physical SparkPlan, because Spark has no as-of join and
  * the composed alternatives either explode (range join + dedup) or need
  * a union trick (Joins.joinAsof).
  *
  * Semantics: for every left row, the single right row with the same key
  * and — `backward` (default): the greatest time <= left time; `forward`
  * (r4): the smallest time >= left time. `left` join type null-extends
  * unmatched lefts (DuckDB `ASOF LEFT JOIN`, Pandas `merge_asof`);
  * `inner` (r4) drops them (DuckDB's default `ASOF JOIN`).
  *
  * Scale shape: both sides hash-partition on the key and sort by
  * (key, time) — exactly one shuffle each, like a sort-merge join — then
  * a single forward merge pass per partition with O(1) state (two
  * buffered right rows). No buffering of the right side, no blowup, skew
  * bounded by rows-per-key.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    forward: Boolean = false, inner: Boolean = false,
    tolerance: Long = Long.MaxValue) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (inner) right.output else right.output.map(_.withNullability(true)))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd, inner, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, fwd, inner, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    forward: Boolean, inner: Boolean, tolerance: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (inner) right.output else right.output.map(_.withNullability(true)))

  // one shuffle per side, co-partitioned on the key (as SortMergeJoin)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  // per-partition sort by (key, time) so a single merge pass suffices
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val rightSize = right.output.size
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightSize)
      val joiner = new JoinedRow
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      // Generated (key, time) extractors: one codegen'd UnsafeProjection per
      // side gives primitive getLong/isNullAt access — the merge loop below
      // compares raw longs, no boxed Expression.eval per comparison (the
      // neighboring built-in joins are whole-stage codegen'd; this keeps the
      // custom operator's per-row cost in the same class).
      val lKT = UnsafeProjection.create(Seq(lkB, ltB))
      val rKT = UnsafeProjection.create(Seq(rkB, rtB))
      // Buffered right state: the row copy plus its primitive key/time,
      // extracted ONCE at consume time (previously re-eval'd per comparison).
      // A null-keyed or null-timed right row can never be an as-of match
      // (DuckDB ASOF skips them too) and must not reach the primitive
      // comparisons, where null would read as 0 and match a legitimate 0.
      var rHead: InternalRow = null
      var rHeadKey = 0L
      var rHeadTime = 0L
      var rPrev: InternalRow = null
      var rPrevKey = 0L
      var rPrevTime = 0L
      def advanceRight(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val r = rIter.next()
          val kt = rKT(r)
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
            rHead = r.copy()
            rHeadKey = kt.getLong(0)
            rHeadTime = kt.getLong(1)
          }
        }
      }
      advanceRight()
      lIter.flatMap { l =>
        val lkt = lKT(l) // reused buffer; primitives read out immediately
        var matched: InternalRow = null
        if (!lkt.isNullAt(0) && !lkt.isNullAt(1)) {
          val lk = lkt.getLong(0)
          val lt = lkt.getLong(1)
          if (forward) {
            // smallest right time >= left time: advance past strictly-earlier
            // rows; the head (if key-matched) IS the answer and is NOT
            // consumed — it may serve later lefts of the same key too
            while (rHead != null &&
                   (rHeadKey < lk || (rHeadKey == lk && rHeadTime < lt))) {
              advanceRight()
            }
            if (rHead != null && rHeadKey == lk && rHeadTime >= lt &&
                rHeadTime - lt <= tolerance) matched = rHead
          } else {
            while (rHead != null &&
                   (rHeadKey < lk || (rHeadKey == lk && rHeadTime <= lt))) {
              rPrev = rHead
              rPrevKey = rHeadKey
              rPrevTime = rHeadTime
              advanceRight()
            }
            if (rPrev != null && rPrevKey == lk && rPrevTime <= lt &&
                lt - rPrevTime <= tolerance) matched = rPrev
          }
        }
        if (matched == null && inner) None
        else Some(proj(joiner(l, if (matched == null) nullRight else matched)))
      }
    }
  }
}

object AsOfJoin {
  import org.apache.spark.sql.catalyst.expressions.{Cast, UnixDate, UnixMicros}
  import org.apache.spark.sql.graftbridge.SqlBridge
  import org.apache.spark.sql.types._

  /** Normalize a key/time column to LongType at plan construction so the
    * exec's Long merge loop stays monomorphic. Integrals widen exactly;
    * dates become epoch days, timestamps epoch micros (both exact and
    * strictly monotone, so as-of semantics are preserved). Anything else
    * fails HERE — analysis time — with a clear message, not at runtime. */
  private def toLong(e: Expression, role: String): Expression = e.dataType match {
    case LongType => e
    case ByteType | ShortType | IntegerType => Cast(e, LongType)
    case DateType => UnixDate(e)
    case TimestampType => UnixMicros(e)
    case TimestampNTZType => UnixMicros(Cast(e, TimestampType))
    case dt => throw new IllegalArgumentException(
      s"as-of $role column must be an integral, date or timestamp type; got ${dt.sql}")
  }

  /** Unit family of a time column: integral/date/timestamp normalize to
    * different units (raw/days/micros), so mixing them across sides would
    * compare incommensurate numbers. */
  private def unitFamily(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integral"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case other => other.sql
  }

  /** `asof(left, right, key, time)`: as-of join on equal `key`.
    * `direction = "backward"` (default) matches the greatest right `time`
    * <= left `time`; `"forward"` the smallest right `time` >= left `time`.
    * `joinType = "left"` (default) null-extends unmatched lefts; `"inner"`
    * drops them. Key and time columns may be any integral, date or
    * timestamp type (normalized to Long internally); the two time columns
    * must be in the same unit family. The two sides must not share
    * attribute ids (alias a self-joined table). */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           direction: String = "backward", joinType: String = "left",
           tolerance: Option[Long] = None): DataFrame = {
    require(tolerance.forall(_ >= 0), s"as-of tolerance must be >= 0, got $tolerance")
    require(direction == "backward" || direction == "forward",
      s"as-of direction must be backward or forward, got $direction")
    require(joinType == "left" || joinType == "inner",
      s"as-of joinType must be left or inner, got $joinType")
    val spark = SparkSession.active
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
    val la = SqlBridge.analyzed(left)
    val ra = SqlBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val (lt, rt) = (attr(la, leftTime), attr(ra, rightTime))
    require(unitFamily(lt.dataType) == unitFamily(rt.dataType),
      s"as-of time columns must share a unit family; got ${lt.dataType.sql} vs ${rt.dataType.sql}")
    // keys normalize to different units per family too (epoch-days vs raw
    // longs): mixing DateType and integral keys would silently compare
    // incommensurate numbers and produce all-NULL matches
    val (lkA, rkA) = (attr(la, leftKey), attr(ra, rightKey))
    require(unitFamily(lkA.dataType) == unitFamily(rkA.dataType),
      s"as-of key columns must share a unit family; got ${lkA.dataType.sql} vs ${rkA.dataType.sql}")
    SqlBridge.ofRows(spark, AsOfJoinPlan(la, ra,
      toLong(lkA, "key"), toLong(rkA, "key"),
      toLong(lt, "time"), toLong(rt, "time"),
      forward = direction == "forward", inner = joinType == "inner",
      tolerance = tolerance.getOrElse(Long.MaxValue)))
  }
}
