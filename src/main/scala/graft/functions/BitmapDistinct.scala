package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, MapType}

/** EXACT distinct count over per-group bitmap-map state — the roll-up
  * companion of the MV `count(DISTINCT)` maintenance (r15): each input
  * row carries a `map<bucket, bitmap>` (the agg_bitmap_distinct
  * two-level device [[graft.operators.MaterializedView]] stores per
  * group), the aggregate ORs the maps bucket-wise across rows —
  * presence is idempotent, so the union over any merge tree is the
  * union of the underlying value sets — and `eval` emits the popcount
  * sum: the exact COUNT(DISTINCT) of the union. This is what lets a
  * dims-SUBSET query re-derive a distinct count from the
  * |groups|-row MV state instead of re-scanning the 100 TB source:
  * state is ≤ one bitmap set per task at any input size, and the
  * shuffle moves one OR-merged map per partition. */
case class BitmapMapOrAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Array[Byte]]] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(LongType, BinaryType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_map_distinct expects MAP<BIGINT, BINARY>, got ${other.sql}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_map_distinct"

  override def createAggregationBuffer(): mutable.HashMap[Long, Array[Byte]] =
    mutable.HashMap.empty[Long, Array[Byte]]

  private def orInto(buf: mutable.HashMap[Long, Array[Byte]],
                     bkt: Long, bm: Array[Byte]): Unit =
    buf.get(bkt) match {
      case Some(prev) => buf.update(bkt, HashKernels.bitmapOr(prev, bm))
      case None => buf.update(bkt, bm.clone())
    }

  override def update(buf: mutable.HashMap[Long, Array[Byte]],
                      input: InternalRow): mutable.HashMap[Long, Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[MapData]
      val ks = m.keyArray()
      val vs = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        if (!vs.isNullAt(i)) orInto(buf, ks.getLong(i), vs.getBinary(i))
        i += 1
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[Long, Array[Byte]],
                     b: mutable.HashMap[Long, Array[Byte]]): mutable.HashMap[Long, Array[Byte]] = {
    b.foreach { case (k, bm) => orInto(a, k, bm) }
    a
  }

  override def eval(buf: mutable.HashMap[Long, Array[Byte]]): Any = {
    var n = 0L
    buf.valuesIterator.foreach { bm =>
      var i = 0
      while (i < bm.length) { n += java.lang.Integer.bitCount(bm(i) & 0xff); i += 1 }
    }
    n
  }

  override def serialize(buf: mutable.HashMap[Long, Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, bm) =>
      out.writeLong(k)
      out.writeInt(bm.length)
      out.write(bm)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Array[Byte]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Long, Array[Byte]]
    var i = 0
    while (i < n) {
      val k = in.readLong()
      val len = in.readInt()
      val bm = new Array[Byte](len)
      in.readFully(bm)
      buf.update(k, bm)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMapOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMapOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapMapOrAgg =
    copy(child = newChildren.head)
}

object BitmapMapOrAgg {
  /** Column API: exact distinct count of the union of bitmap maps. */
  def bitmap_map_distinct(c: Column): Column =
    SqlBridge.column(BitmapMapOrAgg(SqlBridge.expression(c)).toAggregateExpression())

  /** SQL registration: `SELECT bitmap_map_distinct(bm) FROM …`. */
  val functionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("bitmap_map_distinct"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[BitmapMapOrAgg].getName, "bitmap_map_distinct"),
    (exprs: Seq[Expression]) => {
      if (exprs.length != 1) throw new IllegalArgumentException(
        s"bitmap_map_distinct expects (MAP<BIGINT,BINARY> col), got ${exprs.length} args")
      BitmapMapOrAgg(exprs.head)
    })
}
