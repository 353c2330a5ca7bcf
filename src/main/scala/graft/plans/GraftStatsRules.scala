package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}

/** CBO statistics visibility for graft-table scans (r11, VERDICT r10
  * #7).
  *
  * The graft SQL scan executes through Spark's `V1Scan` bridge (the
  * native vectorized parquet path), and `V2ScanRelationPushDown` wraps
  * a V1 scan in a plain [[V1ScanWrapper]] — which implements ONLY
  * `Scan`, so `DataSourceV2ScanRelation.computeStats` never sees the
  * wrapped scan's `SupportsReportStatistics` and the logical plan
  * reports the "unknown = huge" default. That starves cost-based join
  * reorder of the row counts and NDV sketches the manifest carries.
  *
  * Two late optimizer rules close the gap, self-installed into
  * `spark.experimental.extraOptimizations` when the graft catalog
  * initializes (runtime-attachable — no session rebuild; the "User
  * Provided Optimizers" batch runs after the built-in Join Reorder,
  * which will have skipped stats-less V1-wrapped plans):
  *
  *  1. [[GraftStatsRules.ExposeV1ScanStats]] swaps each stats-capable
  *     V1 wrapper for [[GraftStatsV1ScanWrapper]], a subclass that
  *     re-exposes `estimateStatistics()` — `transformV2Stats` then
  *     feeds numRows + columnStats (NDV, null counts) into catalyst
  *     attribute stats.
  *  2. Spark's own `CostBasedJoinReorder` re-runs over the now-sighted
  *     plan (a no-op unless `spark.sql.cbo.enabled` and
  *     `spark.sql.cbo.joinReorder.enabled` are set, same as the
  *     built-in batch).
  */
class GraftStatsV1ScanWrapper(v1: V1Scan with SupportsReportStatistics,
                              handled: Seq[org.apache.spark.sql.sources.Filter],
                              ops: PushedDownOperators)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): Statistics = v1.estimateStatistics()
  // V1ScanWrapper is a case class: without these overrides the subclass
  // compares STRUCTURALLY EQUAL to the wrapper it replaces, so
  // TreeNode.transform sees an "unchanged" node and silently keeps the
  // original — the rule below would be a no-op
  override def canEqual(that: Any): Boolean = that.isInstanceOf[GraftStatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case g: GraftStatsV1ScanWrapper => super.equals(g)
    case _ => false
  }
}

object GraftStatsRules {
  object ExposeV1ScanStats extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
      case r: DataSourceV2ScanRelation
          if r.scan.isInstanceOf[V1ScanWrapper] &&
            !r.scan.isInstanceOf[GraftStatsV1ScanWrapper] &&
            r.scan.asInstanceOf[V1ScanWrapper].v1Scan
              .isInstanceOf[SupportsReportStatistics] =>
        val w = r.scan.asInstanceOf[V1ScanWrapper]
        r.copy(scan = new GraftStatsV1ScanWrapper(
          w.v1Scan.asInstanceOf[V1Scan with SupportsReportStatistics],
          w.handledFilters, w.pushedDownOperators))
    }
  }

  /** One combined pass: expose stats, then run Spark's own
    * CostBasedJoinReorder exactly ONCE per plan (the built-in batch is
    * FixedPoint(1) because the reorder is not idempotent; the user
    * batch is a true fixed point, so a tag guards re-application —
    * without it the batch spins to max iterations). */
  object CboOverV1Stats extends Rule[LogicalPlan] {
    private val Done =
      org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.cbo.reorder.done")
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val exposed = ExposeV1ScanStats(plan)
      if (exposed.getTagValue(Done).contains(true)) exposed
      else {
        val out = org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder(exposed)
        out.setTagValue(Done, true)
        out
      }
    }
  }

  /** Idempotent; called from the catalog's `initialize`. */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq CboOverV1Stats))
      spark.experimental.extraOptimizations = cur :+ (CboOverV1Stats: Rule[LogicalPlan])
  }
}
