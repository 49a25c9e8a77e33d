package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{SupportsReportStatistics, V1Scan, Statistics => V2Statistics}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}

/** Restores scan statistics across Spark's V1Scan bridge.
  *
  * `V2ScanRelationPushDown` wraps every [[V1Scan]] in a [[V1ScanWrapper]]
  * that implements only `Scan` — so a V1-bridged connector's
  * [[SupportsReportStatistics]] is invisible to
  * `DataSourceV2ScanRelation.computeStats`, every such relation estimates
  * at `defaultSizeInBytes` (Long.MaxValue), and no join over it can ever
  * auto-broadcast. For the ACID catalog that would silently turn every
  * unhinted dimension join into a sort-merge shuffle — invisible at test
  * scale, a dominant cost at 100 TB.
  *
  * [[StatsV1ScanWrapper]] is a drop-in [[V1ScanWrapper]] (same case-class
  * unapply, so `DataSourceV2Strategy`'s physical match is untouched) that
  * forwards `estimateStatistics` to the wrapped scan;
  * [[AcidScanStatsRule]] swaps it in after pushdown (pre-CBO batch runs
  * after "Early Filter and Projection Push-Down" and before join
  * planning). The underlying estimate is manifest-metadata-only — see
  * `AcidScanBuilder.build().estimateStatistics`.
  */
final class StatsV1ScanWrapper(
    v1: V1Scan,
    handled: Seq[org.apache.spark.sql.sources.Filter],
    ops: PushedDownOperators)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): V2Statistics =
    v1.asInstanceOf[SupportsReportStatistics].estimateStatistics()

  // V1ScanWrapper is a case class, so the inherited equals would make the
  // swapped node compare EQUAL to the original and TreeNode.transform's
  // fastEquals would silently keep the stats-less node. Distinguish the
  // classes (Stats wrappers still compare equal among themselves, so
  // exchange reuse is unaffected after the rule has run).
  override def canEqual(other: Any): Boolean = other.isInstanceOf[StatsV1ScanWrapper]
  override def equals(other: Any): Boolean = other match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
}

object AcidScanStatsRule extends Rule[LogicalPlan] {

  /** Idempotently append this rule to the session's extraOptimizations
    * ("User Provided Optimizers" — the one extension-reachable batch that
    * runs after scan pushdown and before join planning in Spark 4.1). */
  def install(session: org.apache.spark.sql.SparkSession): Unit = synchronized {
    val exp = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(AcidScanStatsRule))
      exp.extraOptimizations = exp.extraOptimizations :+ AcidScanStatsRule
  }

  private def needsSwap(scan: org.apache.spark.sql.connector.read.Scan): Boolean =
    scan match {
      case w: V1ScanWrapper =>
        !w.isInstanceOf[StatsV1ScanWrapper] &&
          w.v1Scan.isInstanceOf[SupportsReportStatistics]
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation if needsSwap(r.scan) =>
      val w = r.scan.asInstanceOf[V1ScanWrapper]
      r.copy(scan = new StatsV1ScanWrapper(w.v1Scan, w.handledFilters, w.pushedDownOperators))
  }
}
