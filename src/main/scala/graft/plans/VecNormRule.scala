package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.VecDot

/** Catalyst optimizer rule — the custom-`Rule` tier of SURVEY.md §4.3's
  * preference order (tier (b) native Expressions and tier (c)
  * plan+strategy are VecDot/Ipv4Quad and AsOfJoin): pushes self-dot norms
  * `vec_dot(x, x)` (a vector column's norm²) from a projection ABOVE a
  * join down to the join input that produces `x`.
  *
  * Why: cosine similarity is `dot(a,b) / (|a|·|b|)`. Written naively —
  * which is exactly how `sim_topk`/`dedup_embed` declare it — the norms
  * sit in the projection over the (probe × candidate) join output and are
  * recomputed PER PAIR: |Q|·|C| norm loops when only |Q|+|C| distinct
  * norms exist. Pushed below the join, each input row's norm is computed
  * once and flows through the join as a plain double column. At 100 TB
  * the per-pair arithmetic IS the brute-force re-rank's cost; this
  * deletes two of its three vector loops.
  *
  * Safe for every join type: VecDot is deterministic and null-propagating,
  * so a null-extended outer-join row yields NULL for the pushed column
  * exactly as it would for the unpushed expression. The rewrite fires
  * only on self-dots over direct attribute references — the shape the
  * cosine operators emit — and is idempotent (rewritten projections
  * reference plain attributes, which no longer match).
  */
object PushVecNormThroughJoin extends Rule[LogicalPlan] {

  /** Idempotent per-session registration via `experimental.extraOptimizations`
    * — the path for sessions not built with GraftExtensions (the operators
    * call this themselves, like AsOfJoin registers its strategy). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(PushVecNormThroughJoin))
      spark.experimental.extraOptimizations = cur :+ PushVecNormThroughJoin
  }

  private def selfDotsIn(exprs: Seq[Expression]): Seq[AttributeReference] =
    exprs.flatMap(_.collect {
      case VecDot(a: AttributeReference, b: AttributeReference) if a.exprId == b.exprId => a
    }).groupBy(_.exprId).values.map(_.head).toSeq

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: Join) => rewrite(p, j, None)
    case p @ Project(_, f @ Filter(_, j: Join)) => rewrite(p, j, Some(f))
  }

  private def rewrite(p: Project, j: Join, f: Option[Filter]): LogicalPlan = {
    val pushable = selfDotsIn(p.projectList).filter(a =>
      j.left.outputSet.contains(a) || j.right.outputSet.contains(a))
    if (pushable.isEmpty) return p
    val aliases: Map[ExprId, Alias] =
      pushable.map(a => a.exprId -> Alias(VecDot(a, a), s"_norm2_${a.name}")()).toMap
    def withNorms(child: LogicalPlan): LogicalPlan = {
      val mine = pushable.filter(a => child.outputSet.contains(a))
      if (mine.isEmpty) child
      else Project(child.output ++ mine.map(a => aliases(a.exprId)), child)
    }
    val newJoin = j.copy(left = withNorms(j.left), right = withNorms(j.right))
    val newChild: LogicalPlan = f.map(x => x.copy(child = newJoin)).getOrElse(newJoin)
    val newList = p.projectList.map(_.transform {
      case VecDot(a: AttributeReference, b: AttributeReference)
          if a.exprId == b.exprId && aliases.contains(a.exprId) =>
        aliases(a.exprId).toAttribute
    }.asInstanceOf[NamedExpression])
    Project(newList, newChild)
  }
}
