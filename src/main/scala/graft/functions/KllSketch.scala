package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketches as a native imperative aggregate family (r18,
  * VERDICT r17 #1) — the mergeable-state device that lets MATERIALIZED
  * VIEWS maintain `approx_pct` incrementally, mirroring the HLL triple
  * the approx-distinct path uses (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`) and the count–min family in [[CountMinAgg]]:
  *
  *  - `kll_agg(col)` — build; returns the serialized KLL doubles sketch
  *    as BINARY (datasketches KLL, k = 200 — the library default, and
  *    like the HLL path's pinned lgK the ONE parameter both MV state
  *    and query-side sketches use, so they always merge compatibly);
  *  - `kll_merge(sk)` — re-aggregate already-built sketches (the MV
  *    roll-up tier: per-group sketches union to a coarser grain without
  *    touching raw data — KLL merge preserves the rank-error bound);
  *  - `kll_quantile(sk, p)` — scalar rank-`p` quantile estimate of a
  *    sketch (INCLUSIVE search criteria, the datasketches default).
  *
  * Same TypedImperativeAggregate tier as Spark's own percentile
  * machinery: one O(k log(n/k))-byte buffer per grouping state, partial
  * → shuffle → final moves SKETCHES, never rows — at 1000 executors the
  * maintenance shuffle stays |groups|-shaped. Estimates carry the KLL
  * rank-error guarantee (~1.65% at k=200, two-sided) and the sketch is
  * EXACT while a group holds ≤ k values. Spark ships no KLL surface
  * (`approx_percentile` is a different, non-mergeable-state estimator),
  * hence this custom family — preference tier (b) of SURVEY §4.3.
  * ABSENT in reference (the 253-line ETL computes no aggregations at
  * all); semantics from the public KLL literature (Karnin/Lang/
  * Liberty, FOCS'16) and the Apache DataSketches KLL spec.
  */
case class KllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_agg expects a DOUBLE column (cast numerics), got ${other.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllSketch.K)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    // NULLs and NaNs contribute no rank (matching percentile semantics)
    if (v != null && !v.asInstanceOf[Double].isNaN)
      buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllAgg =
    copy(child = newChildren.head)
}

/** Merge already-serialized KLL sketches (BINARY column) into one —
  * the roll-up tier the MV rewrite uses for subset-dim quantile
  * queries: per-group sketches union to the coarser grain. Buffer
  * starts `null` (all-NULL input yields NULL, matching SQL aggregate
  * semantics over empty input). */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge expects a BINARY sketch column, got ${other.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge"

  override def createAggregationBuffer(): KllDoublesSketch = null

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = KllSketch.fromBytes(v.asInstanceOf[Array[Byte]])
      if (buf == null) sk else { buf.merge(sk); buf }
    }
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch =
    if (a == null) b else if (b == null) a else { a.merge(b); a }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf == null) null else buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    if (buf == null) Array.emptyByteArray else buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    if (bytes.isEmpty) null else KllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** Scalar pairwise sketch union — the MV MERGE step's device (state
  * sketch ⊎ delta sketch per group row; null-handling lives in the
  * caller's `when` so this stays a null-propagating binary op). */
case class KllUnion2(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_union2 expects two BINARY sketches, got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_union2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sk = KllSketch.fromBytes(a.asInstanceOf[Array[Byte]])
    sk.merge(KllSketch.fromBytes(b.asInstanceOf[Array[Byte]]))
    sk.toByteArray
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllUnion2 =
    copy(left = newLeft, right = newRight)
}

/** Scalar quantile probe: `kll_quantile(sketch, p)` → DOUBLE estimate
  * at rank p ∈ [0,1] (INCLUSIVE criteria); NULL for an empty sketch
  * (the no-non-null-rows group, matching percentile-over-empty).
  * Deserialization memoizes on the bytes' reference — in the MV serve
  * plan the sketch column is scanned once per state row, and repeated
  * probes of the same sketch (multi-quantile selects) parse once. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile expects (BINARY sketch, DOUBLE rank), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  // an EMPTY sketch (all-NULL group) probes to NULL even when both
  // children are non-nullable — the default child-OR rule is wrong here
  override def nullable: Boolean = true

  @transient private var cached: (AnyRef, KllDoublesSketch) = _

  override protected def nullSafeEval(sketch: Any, p: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val c = cached
    val sk =
      if (c != null && (c._1 eq bytes)) c._2
      else {
        val parsed = KllSketch.fromBytes(bytes)
        cached = (bytes, parsed)
        parsed
      }
    val rank = p.asInstanceOf[Double]
    require(rank >= 0.0 && rank <= 1.0,
      s"kll_quantile rank must be in [0,1], got $rank")
    if (sk.isEmpty) null else sk.getQuantile(rank)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

object KllSketch {
  /** The ONE sketch parameter (datasketches default; ~1.65% two-sided
    * rank error) — pinned like the HLL path's lgK 12 so MV state and
    * query-side sketches always merge compatibly. */
  val K: Int = 200

  private[functions] def fromBytes(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Column-API entry points (the build casts its input to DOUBLE). */
  def kll_agg(c: Column): Column =
    SqlBridge.column(KllAgg(Cast(SqlBridge.expression(c), DoubleType))
      .toAggregateExpression())
  def kll_merge(c: Column): Column =
    SqlBridge.column(KllMergeAgg(SqlBridge.expression(c))
      .toAggregateExpression())
  def kll_union2(a: Column, b: Column): Column =
    SqlBridge.column(KllUnion2(SqlBridge.expression(a), SqlBridge.expression(b)))
  def kll_quantile(c: Column, p: Double): Column =
    SqlBridge.column(KllQuantile(SqlBridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(p, DoubleType)))

  val aggDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_agg"),
    new ExpressionInfo(classOf[KllAgg].getName, "kll_agg"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "kll_agg(col) takes 1 argument")
      KllAgg(Cast(exprs.head, DoubleType))
    })
  val mergeDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_merge"),
    new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "kll_merge(sketch) takes 1 argument")
      KllMergeAgg(exprs.head)
    })
  val quantileDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kll_quantile"),
    new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "kll_quantile(sketch, p) takes 2 arguments")
      KllQuantile(exprs.head, Cast(exprs(1), DoubleType))
    })
}
