package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a NATIVE imperative aggregate —
  * the `TypedImperativeAggregate` tier Spark's own `percentile` /
  * `collect_list` run on (an opaque mutable buffer carried through
  * partial → shuffle → final aggregation via `serialize`/`deserialize`).
  *
  * The sketch holds at most `k` (term → count) counters per partial
  * buffer: seeing an untracked term with all counters full decrements
  * every counter (dropping zeros) — the streaming argument charges each
  * decrement round against k+1 distinct items, so any term with true
  * frequency > n/(k+1) MUST survive with a positive counter
  * (MisraGriesSpec pins this against adversarial orderings). Merging two
  * sketches adds counts, then subtracts the (k+1)-largest count from all
  * and drops non-positives (Agarwal et al., "Mergeable Summaries",
  * PODS'12) — the guarantee composes across any merge tree, which is
  * exactly what a 1000-executor partial/final aggregation needs: state is
  * O(k) per task at ANY input size, and the shuffle moves one k-entry
  * sketch per partition instead of one row per distinct term.
  *
  * `eval` emits the candidate terms sorted lexically. The candidate SET
  * is order/partitioning-dependent for items near the threshold (inherent
  * to the sketch), so the deterministic `agg_heavy_hitters` query treats
  * it as a CANDIDATE GENERATOR and recounts candidates exactly — sketch
  * recall guarantee + exact precision pass = deterministic output.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  // ExpectsInputTypes is unusable outside org.apache.spark.sql
  // (AbstractDataType is private[sql]); enforce the input type directly
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a STRING column, got ${other.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MisraGriesAgg.add(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    MisraGriesAgg.mergeInto(a, b, k)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    MisraGriesAgg.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MisraGriesAgg.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column-API entry: ARRAY<STRING> of ≤ k heavy-hitter candidates —
    * guaranteed to include every term with frequency > n/(k+1). */
  def misra_gries(c: Column, k: Int): Column =
    SqlBridge.column(MisraGriesAgg(SqlBridge.expression(c), k).toAggregateExpression())

  /** SQL registration: `SELECT misra_gries(term, 30) FROM …` (k must be
    * a literal int — it sizes per-task state at plan time). */
  val functionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("misra_gries"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[MisraGriesAgg].getName, "misra_gries"),
    (exprs: Seq[Expression]) => {
      if (exprs.length != 2) throw new IllegalArgumentException(
        s"misra_gries expects (STRING col, INT k literal), got ${exprs.length} args")
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"misra_gries k must be an INT literal, got ${other.sql}")
      }
      MisraGriesAgg(exprs.head, k)
    })

  /** Streaming-side sketch kernel, shared with the aggregate's `update`:
    * admit `term` into an ≤ k-counter buffer, decrementing-all when full
    * (each decrement round is charged against k+1 distinct items — the
    * survival guarantee's argument). Also backs `stream_heavy_hitters`'
    * mapGroupsWithState state transition. */
  def add(buf: mutable.HashMap[String, Long], term: String, k: Int): Unit =
    buf.get(term) match {
      case Some(c) => buf.update(term, c + 1)
      case None if buf.size < k => buf.update(term, 1L)
      case None =>
        buf.keys.toArray.foreach { t =>
          val c = buf(t) - 1
          if (c <= 0) buf.remove(t) else buf.update(t, c)
        }
    }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12), shared with
    * the aggregate's `merge`: add counts, then subtract the (k+1)-largest
    * count from all and drop non-positives — ≤ k counters out, error
    * bound preserved under any merge tree. */
  def mergeInto(a: mutable.HashMap[String, Long], b: collection.Map[String, Long], k: Int): Unit = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-largest
      a.keys.toArray.foreach { t =>
        val c = a(t) - sub
        if (c <= 0) a.remove(t) else a.update(t, c)
      }
    }
  }

  /** The one (term → count) wire format every MG carrier shares —
    * aggregation-buffer shuffle AND the MV's stored state column. */
  private[functions] def toBytes(buf: collection.Map[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  private[functions] def fromBytes(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }
}

/** Sketch-VALUED Misra–Gries build (r18): same kernel as
  * [[MisraGriesAgg]] but evaluating to the SERIALIZED summary (BINARY)
  * instead of the candidate array — the mergeable state the MV path
  * stores per group (`approx_topk`). */
case class MgSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"mg_agg needs k >= 1, got $k")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_agg expects a STRING column, got ${other.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "mg_agg"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]
  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MisraGriesAgg.add(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }
  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    MisraGriesAgg.mergeInto(a, b, k)
    a
  }
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    MisraGriesAgg.toBytes(buf)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    MisraGriesAgg.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MisraGriesAgg.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MgSketchAgg =
    copy(child = newChildren.head)
}

/** Merge already-serialized MG summaries (BINARY column) into one —
  * the MV roll-up tier: per-group summaries combine to a coarser grain
  * without touching raw data (the PODS'12 bound composes across any
  * merge tree). */
case class MgMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"mg_merge needs k >= 1, got $k")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_merge expects a BINARY summary column, got ${other.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "mg_merge"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]
  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null)
      MisraGriesAgg.mergeInto(buf,
        MisraGriesAgg.fromBytes(v.asInstanceOf[Array[Byte]]), k)
    buf
  }
  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    MisraGriesAgg.mergeInto(a, b, k)
    a
  }
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    MisraGriesAgg.toBytes(buf)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] =
    MisraGriesAgg.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] =
    MisraGriesAgg.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MgMergeAgg =
    copy(child = newChildren.head)
}

/** Scalar pairwise summary union at bound `k` — the MV MERGE step's
  * device (state ⊎ delta per group row). */
case class MgUnion2(left: Expression, right: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            org.apache.spark.sql.types.BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"mg_union2 expects two BINARY summaries, got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "mg_union2"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val m = MisraGriesAgg.fromBytes(a.asInstanceOf[Array[Byte]])
    MisraGriesAgg.mergeInto(m,
      MisraGriesAgg.fromBytes(b.asInstanceOf[Array[Byte]]), k)
    MisraGriesAgg.toBytes(m)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MgUnion2 =
    copy(left = newLeft, right = newRight)
}

/** Scalar candidate extraction: serialized summary → the same sorted
  * ARRAY<STRING> [[MisraGriesAgg]].eval emits — one shared surface, so
  * a served query and the direct plan read the same representation. */
case class MgTopK(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_topk expects a BINARY summary, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_topk"
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      MisraGriesAgg.fromBytes(v.asInstanceOf[Array[Byte]])
        .keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))
  override protected def withNewChildInternal(newChild: Expression): MgTopK =
    copy(child = newChild)
}

object MgSketch {
  def mg_agg(c: Column, k: Int): Column =
    SqlBridge.column(MgSketchAgg(SqlBridge.expression(c), k).toAggregateExpression())
  def mg_merge(c: Column, k: Int): Column =
    SqlBridge.column(MgMergeAgg(SqlBridge.expression(c), k).toAggregateExpression())
  def mg_union2(a: Column, b: Column, k: Int): Column =
    SqlBridge.column(MgUnion2(SqlBridge.expression(a), SqlBridge.expression(b), k))
  def mg_topk(c: Column): Column =
    SqlBridge.column(MgTopK(SqlBridge.expression(c)))
}
