package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** AQE-aware physical-plan traversal. A plain `plan.collect { … }` is
  * BLIND under adaptive execution: `AdaptiveSparkPlanExec` is a leaf node
  * whose real tree hangs off `executedPlan`, query stages wrap their
  * subtree in `QueryStageExec.plan`, reused exchanges point at a `child`
  * outside the child list, and cached subtrees hide behind
  * `InMemoryTableScanExec.relation.cachedPlan`. Plan-shape guards that
  * matter (no unpartitioned window, no cartesian, scan counts) must walk
  * through all four wrappers or they assert on a one-node tree.
  */
object PlanWalk {

  /** Every node reachable from `p`, descending through AQE wrappers,
    * query stages, exchange reuse, and cached-relation plans.
    */
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val through: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
      case other => other.children
    }
    p +: through.flatMap(flatten)
  }

  /** Unpartitioned window operators anywhere in the tree — the
    * single-task global-sort anti-pattern (VERDICT r8 item 1). Covers
    * both `WindowExec` and the rank-limit pushdown variant.
    */
  def unpartitionedWindows(p: SparkPlan): Seq[SparkPlan] =
    flatten(p).filter {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.isEmpty
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        w.partitionSpec.isEmpty
      case _ => false
    }

  /** All window operators (partitioned or not) in the tree. */
  def windows(p: SparkPlan): Seq[SparkPlan] =
    flatten(p).filter(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])

  /** Real parquet scans in the tree. Cached innards ARE included when
    * reachable; callers guarding "source scanned once behind a cache"
    * should use [[liveFileScans]] instead.
    */
  def fileScans(p: SparkPlan): Seq[SparkPlan] =
    flatten(p).filter(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])

  /** File scans NOT behind an InMemoryTableScan (i.e. scans the query
    * would re-run rather than read from cache).
    */
  def liveFileScans(p: SparkPlan): Seq[SparkPlan] = {
    def walk(n: SparkPlan): Seq[SparkPlan] = {
      val through: Seq[SparkPlan] = n match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _: InMemoryTableScanExec => Seq.empty // cached: not live
        case other => other.children
      }
      (n match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case _ => Seq.empty
      }) ++ through.flatMap(walk)
    }
    walk(p)
  }

  def cartesians(p: SparkPlan): Seq[SparkPlan] =
    flatten(p).filter(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec])
}
