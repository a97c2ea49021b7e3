package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Restores partition-local Sorts over a graft bucket scan whose
  * join-time gcd REDUCTION made its per-partition ordering claim a
  * lie — the surgical replacement for r15's session-global claim
  * withdrawal under `allowCompatibleTransforms`.
  *
  * The hole this closes: with compatible transforms enabled, a
  * mismatched-bucket-count SPJ reduces both sides to the gcd and
  * CONCATENATES the finer side's buckets per reduced key at execution
  * time — but Spark's own grouped-partition ordering check (ordering
  * survives only groups of ≤ 1 split) runs on the PRE-reduction
  * grouping, so a key-sorted scan's claim survives planning and a
  * sort-free merge join zips the unsorted concatenation, silently
  * dropping rows (observed live in r15: 92/200). r15's fix withdrew
  * the claim whenever the conf was on — sound but coarse: an
  * EQUAL-count join in the same session lost its sort-free zipper
  * too, re-planning Sorts it never needed.
  *
  * This rule keeps the claim and repairs exactly the broken case: it
  * runs AFTER EnsureRequirements (as a columnar-transition rule, so it
  * applies in both AQE and non-AQE preparations) and wraps every graft
  * [[BatchScanExec]] whose `spjParams.reducers` actually ENGAGED — the
  * precise condition under which execution concatenates partitions —
  * in a partition-local [[SortExec]] on the claimed ordering, making
  * the data match the claim for every consumer. Scans already under a
  * Sort, scans whose claim Spark itself withdrew (multi-split groups
  * return an empty outputOrdering), and unreduced scans are left
  * untouched — the equal-count zipper stays sort-free.
  *
  * [[GraftBucketScan.outputOrdering]] only keeps its claim under the
  * compat conf when this rule is INSTALLED in the active session
  * ([[installed]]), so a session without the graft extensions degrades
  * to the r15 withdrawal instead of the row-dropping lie.
  */
object GraftSpjSortRestore extends Rule[SparkPlan] {

  /** Whether this rule is active in `spark` — the scan's precondition
    * for claiming ordering under `allowCompatibleTransforms`.
    */
  def installed(spark: SparkSession): Boolean =
    org.apache.spark.sql.graftshim.PlanShim.columnarRules(spark)
      .exists(_.preColumnarTransitions eq this)

  private def reductionEngaged(b: BatchScanExec): Boolean =
    b.scan.isInstanceOf[GraftBucketScan] &&
      b.spjParams.reducers.exists(_.exists(_.isDefined))

  override def apply(plan: SparkPlan): SparkPlan = rewrite(plan)

  private def rewrite(p: SparkPlan): SparkPlan = p match {
    case s: SortExec =>
      // a scan directly under a Sort is already repaired (idempotency
      // under AQE's repeated stage preparation) or explicitly ordered
      s.mapChildren {
        case b: BatchScanExec => b
        case other => rewrite(other)
      }
    case b: BatchScanExec
        if reductionEngaged(b) && b.outputOrdering.nonEmpty =>
      SortExec(b.outputOrdering, global = false, child = b)
    case other => other.mapChildren(rewrite)
  }
}
