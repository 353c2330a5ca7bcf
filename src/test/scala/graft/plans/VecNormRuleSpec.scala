package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, Project}

import graft.SparkTestBase
import graft.functions.VecDot
import graft.operators.LlmOps

/** Optimizer-rule tests for PushVecNormThroughJoin: the rewrite fires on
  * the real cosine operators and the rewritten plan returns identical
  * results (the DuckDB oracle on sim_topk double-checks the latter at the
  * correctness gate). */
class VecNormRuleSpec extends SparkTestBase {

  private def selfDotCount(exprs: Seq[Expression]): Int = exprs.map(_.collect {
    case VecDot(a: AttributeReference, b: AttributeReference) if a.exprId == b.exprId => 1
  }.sum).sum

  test("sim_topk: self-dot norms are rewritten below the join (per-row, not per-pair)") {
    val df = LlmOps.simTopk(spark, sfDir) // registers the rule itself
    val opt = df.queryExecution.optimizedPlan
    // no projection sitting on the join output computes a norm anymore...
    val aboveJoin = opt.collect {
      case p @ Project(_, _: Join) => selfDotCount(p.projectList)
      case p @ Project(_, Filter(_, _: Join)) => selfDotCount(p.projectList)
    }.sum
    assert(aboveJoin == 0, s"per-pair norms survived above the join:\n$opt")
    // ...and the pushed norm columns exist below it
    assert(opt.toString.contains("_norm2_"), s"pushed norm aliases missing:\n$opt")
  }

  test("rewritten plan returns bit-identical cosines to the unrewritten plan") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    PushVecNormThroughJoin.register(spark)
    val probes = Seq((1L, Array(1.0, 2.0, 2.0)), (2L, Array(0.5, 0.5, 0.0)))
      .toDF("p_id", "p_emb")
    val corpus = Seq((10L, Array(2.0, 4.0, 4.0)), (11L, Array(0.0, 3.0, 4.0)))
      .toDF("c_id", "c_emb")
    val cos = VecDot.vec_dot(col("p_emb"), col("c_emb")) /
      (VecDot.vec_norm(col("p_emb")) * VecDot.vec_norm(col("c_emb")))
    val withRule = probes.crossJoin(corpus)
      .select(col("p_id"), col("c_id"), cos.as("cos"))
    assert(withRule.queryExecution.optimizedPlan.toString.contains("_norm2_"))
    val got = withRule.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // expected from the same sequential-fold arithmetic, computed locally
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    val local = for {
      (p, pe) <- Seq((1L, Array(1.0, 2.0, 2.0)), (2L, Array(0.5, 0.5, 0.0)))
      (c, ce) <- Seq((10L, Array(2.0, 4.0, 4.0)), (11L, Array(0.0, 3.0, 4.0)))
    } yield (p, c, dot(pe, ce) / (norm(pe) * norm(ce)))
    assert(got == local.toSet)
  }

  test("GraftExtensions wires functions, the norm rule, and the as-of planner strategy") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(e)
    // buildXxx are private[sql] in Scala but public in bytecode
    def built(name: String): Seq[_] = e.getClass
      .getMethod(name, classOf[org.apache.spark.sql.SparkSession])
      .invoke(e, spark).asInstanceOf[Seq[_]]
    assert(built("buildPlannerStrategies").contains(graft.plans.AsOfJoinStrategy),
      "as-of strategy not injected")
    assert(built("buildOptimizerRules").contains(PushVecNormThroughJoin),
      "norm-pushdown rule not injected")
  }

  test("rule leaves plans without joins or without self-dots untouched") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    PushVecNormThroughJoin.register(spark)
    val df = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
      .select(col("id"), VecDot.vec_dot(col("v"), col("v")).as("n2"))
    // no join below: the self-dot stays where it is, nothing is renamed
    assert(!df.queryExecution.optimizedPlan.toString.contains("_norm2_"))
    assert(df.collect().head.getDouble(1) == 5.0)
  }
}
