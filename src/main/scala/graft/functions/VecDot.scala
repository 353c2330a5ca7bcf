package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two `ARRAY<DOUBLE>` columns.
  *
  * The similarity operators' hot loop (`sim_topk`, `sim_ann`,
  * `dedup_embed`) was `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — Spark's
  * higher-order functions build an intermediate products array per row and
  * evaluate the lambdas interpreted (no codegen). This expression is the
  * (b)-tier replacement (SURVEY.md §4.3): a `doGenCode` tight loop over
  * the two `ArrayData` buffers — no allocation, stays inside the
  * WholeStageCodegen span. At 100 TB the brute-force re-rank multiplies
  * this per (probe × candidate); the loop IS the operator's cost.
  *
  * Semantics match the HOF chain bit-for-bit: sequential left-to-right
  * accumulation (same IEEE result), NULL if either array is NULL, if
  * lengths differ (zip_with would pad), or if any element is NULL.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two ARRAY<DOUBLE>, got ${l.sql} and ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Column-API dot product (inputs must already be ARRAY<DOUBLE>). */
  def vec_dot(a: Column, b: Column): Column =
    SqlBridge.column(VecDot(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** L2 norm via the same codegen'd loop. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  val functionDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (exprs: Seq[Expression]) => {
      // arity-checked here so SELECT vec_dot(a) is a clear analysis error,
      // not an IndexOutOfBoundsException from exprs(1)
      if (exprs.length != 2) throw new IllegalArgumentException(
        s"vec_dot expects exactly 2 arguments (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got ${exprs.length}")
      VecDot(exprs(0), exprs(1))
    })
}
