package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count–min sketch as a NATIVE imperative aggregate family (r7 — lifts
  * r6's driver-side `.collect()` merge into the plan). Same engine tier
  * as [[MisraGriesAgg]]: an opaque mutable buffer (Spark's own
  * `util.sketch.CountMinSketch`) carried through partial → shuffle →
  * final aggregation, so at 1000 executors each task keeps ONE
  * O(w·d)-cell sketch and the shuffle moves sketches, never rows.
  *
  * Three pieces, mirroring the engine's HLL triple
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`):
  *  - `count_min(col, eps, conf, seed)` — build; returns the serialized
  *    sketch as BINARY (ε·N one-sided overcount bound, depth from conf);
  *  - `count_min_merge(sk)` — re-aggregate already-built sketches
  *    (per-site → global rollup without touching raw data);
  *  - `count_min_estimate(sk, key)` — scalar point-frequency probe of a
  *    (typically broadcast) sketch.
  *
  * Strings are inserted as their UTF-8 bytes (`addBinary`), which is the
  * byte sequence `estimateCount(String)` hashes — the same convention
  * Spark's SQL `count_min_sketch` agg uses. Fixed seed ⇒ deterministic.
  */
case class CountMinAgg(
    child: Expression,
    eps: Double,
    confidence: Double,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  require(eps > 0 && eps < 1, s"count_min eps must be in (0,1), got $eps")
  require(confidence > 0 && confidence < 1,
    s"count_min confidence must be in (0,1), got $confidence")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min expects a STRING column, got ${other.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.addBinary(v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch = {
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: CountMinSketch): Any = CountMin.toBytes(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = CountMin.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch = CountMin.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

/** Merge already-serialized CMS sketches (BINARY column) into one —
  * the rollup tier: per-site sketches aggregate to a global sketch
  * without revisiting the data. Buffer starts as `null` (no sketch
  * parameters until the first input arrives); sketches with different
  * (eps, conf, seed) fail inside `mergeInPlace` with an incompatibility
  * error rather than merging wrongly. */
case class CountMinMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min_merge expects a BINARY sketch column, got ${other.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "count_min_merge"

  override def createAggregationBuffer(): CountMinSketch = null

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = CountMin.fromBytes(v.asInstanceOf[Array[Byte]])
      if (buf == null) sk else { buf.mergeInPlace(sk); buf }
    }
  }

  override def merge(a: CountMinSketch, b: CountMinSketch): CountMinSketch =
    if (a == null) b else if (b == null) a else { a.mergeInPlace(b); a }

  override def eval(buf: CountMinSketch): Any =
    if (buf == null) null else CountMin.toBytes(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] =
    if (buf == null) Array.emptyByteArray else CountMin.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null else CountMin.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinMergeAgg =
    copy(child = newChildren.head)
}

/** Scalar point-frequency probe: `count_min_estimate(sketch, key)` →
  * BIGINT estimate (never under the true count; over by ≤ ε·N w.h.p.).
  * Deserialization is memoized on the sketch bytes' reference — the
  * sketch side is a 1-row broadcast in every sane plan, so each task
  * parses it once, not per probe row. Interpreted eval (CodegenFallback):
  * the probe is O(depth) hashing, not worth a codegen path. */
case class CountMinEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"count_min_estimate expects (BINARY sketch, STRING key), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "count_min_estimate"

  @transient private var cached: (AnyRef, CountMinSketch) = _

  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val c = cached
    val sk =
      if (c != null && (c._1 eq bytes)) c._2
      else {
        val parsed = CountMin.fromBytes(bytes)
        cached = (bytes, parsed)
        parsed
      }
    sk.estimateCount(key.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  private[functions] def toBytes(sk: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    sk.writeTo(bos)
    bos.toByteArray
  }
  private[functions] def fromBytes(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  /** Column-API entry points. */
  def count_min(c: Column, eps: Double, confidence: Double, seed: Int): Column =
    SqlBridge.column(
      CountMinAgg(SqlBridge.expression(c), eps, confidence, seed).toAggregateExpression())
  def count_min_merge(c: Column): Column =
    SqlBridge.column(CountMinMergeAgg(SqlBridge.expression(c)).toAggregateExpression())
  def count_min_estimate(sketch: Column, key: Column): Column =
    SqlBridge.column(
      CountMinEstimate(SqlBridge.expression(sketch), SqlBridge.expression(key)))

  private def numLit(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"count_min $what must be a numeric literal, got ${other.sql}")
  }

  /** SQL registrations: `count_min(term, 0.001, 0.99, 42)`,
    * `count_min_merge(sk)`, `count_min_estimate(sk, key)`. */
  val aggDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("count_min"),
    new ExpressionInfo(classOf[CountMinAgg].getName, "count_min"),
    (exprs: Seq[Expression]) => {
      if (exprs.length != 4) throw new IllegalArgumentException(
        s"count_min expects (STRING col, eps, confidence, seed literals), got ${exprs.length} args")
      val seed = exprs(3) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"count_min seed must be an INT literal, got ${other.sql}")
      }
      CountMinAgg(exprs.head, numLit(exprs(1), "eps"), numLit(exprs(2), "confidence"), seed)
    })
  val mergeDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("count_min_merge"),
    new ExpressionInfo(classOf[CountMinMergeAgg].getName, "count_min_merge"),
    (exprs: Seq[Expression]) => CountMinMergeAgg(exprs.head))
  val estimateDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("count_min_estimate"),
    new ExpressionInfo(classOf[CountMinEstimate].getName, "count_min_estimate"),
    (exprs: Seq[Expression]) => CountMinEstimate(exprs.head, exprs(1)))
}
