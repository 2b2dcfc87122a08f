package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec, SortExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** PLAN LINTER — the scale-killer patterns this codebase bans, as a
  * queryable API instead of only a test suite: audit a DataFrame's
  * physical plan BEFORE running it and get back the findings a
  * 100 TB review would flag. The same rules PlanAuditSpec pins for
  * the shipped queries, productized so a pipeline author can gate
  * their own compositions (`require(PlanLint.audit(df).isEmpty)`)
  * in CI rather than discovering a cartesian at cluster scale.
  *
  * Rules (deliberately few and precise — a linter that cries wolf
  * gets disabled):
  *  - `cartesian-product`: a CartesianProductExec anywhere — O(n·m)
  *    row pairing; at corpus scale this never finishes.
  *  - `unconditioned-nested-loop`: a BroadcastNestedLoopJoin with NO
  *    join condition on an inner/cross join — the cartesian in
  *    broadcast clothing (a CONDITIONED broadcast NLJ is a
  *    legitimate shape — the threshold-in-condition similarity
  *    joins use it deliberately). EXEMPT when the broadcast side is
  *    provably BOUNDED in-plan (a no-grouping aggregate = exactly one
  *    row, a driver-literal LocalTableScan, or anything under a
  *    LIMIT): attaching a 1-row stats frame or fanning a corpus
  *    against a k-row centroid table is the standard scalar/bounded
  *    expansion idiom, not a hazard.
  *  - `single-partition-window`: a window function with an empty
  *    PARTITION BY — Spark moves every row to one task; the
  *    prefix-sum operators exist precisely to avoid this. EXEMPT when
  *    the window's INPUT is bounded by the same in-plan evidence
  *    (e.g. ranking the top-k rows AFTER a limit).
  *  - `global-sort`: a global SortExec (a full range-exchange sort
  *    of the whole dataset). Top-k reads compile to
  *    TakeOrderedAndProject (not flagged); a bare `orderBy` without
  *    a limit at 100 TB is almost always a mistake — sort within
  *    partitions, or write a clustered layout once instead.
  *
  * The audit walks `queryExecution.sparkPlan` — the deterministic
  * pre-AQE physical plan (AQE can only IMPROVE on it at runtime;
  * anything it fixes was still a latent hazard worth flagging, and
  * auditing pre-AQE keeps the verdict reproducible and free — no
  * execution is triggered). */
object PlanLint {

  final case class Finding(rule: String, node: String)

  /** In-plan evidence that a subtree's OUTPUT row count is bounded:
    * a no-grouping aggregate (exactly one row), driver-literal rows,
    * or a limit/top-k — reached from the ROOT through nodes that
    * cannot increase row counts (project/filter/sort/exchange/window/
    * grouped-agg wrappers). The walk must be root-down, not a
    * whole-subtree search: a bounded node ANYWHERE below (a literal
    * lookup table joined into a huge frame, a stray limit under a
    * union) says nothing about the subtree's own output size, and a
    * find()-style check would silently exempt genuine hazards. */
  private def bounded(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty || bounded(a.child)
    case _: LocalTableScanExec => true
    case _: GlobalLimitExec => true
    case _: TakeOrderedAndProjectExec => true
    case other if other.children.length == 1 &&
        !other.nodeName.contains("Generate") &&
        !other.nodeName.contains("Expand") &&
        (other.nodeName.contains("Project") ||
          other.nodeName.contains("Filter") ||
          other.nodeName.contains("Sort") ||
          other.nodeName.contains("Exchange") ||
          other.nodeName.contains("WholeStageCodegen") ||
          other.nodeName.contains("InputAdapter") ||
          other.nodeName.contains("Coalesce") ||
          other.nodeName.contains("Window") ||
          other.nodeName.contains("AQEShuffleRead") ||
          other.nodeName.contains("ColumnarToRow")) =>
      bounded(other.children.head)
    case _ => false
  }

  def audit(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.sparkPlan
    def name(p: SparkPlan): String = p.nodeName
    plan.collect {
      case p: CartesianProductExec =>
        Seq(Finding("cartesian-product", name(p)))
      case p: BroadcastNestedLoopJoinExec
          if p.condition.isEmpty && (p.joinType.sql == "INNER" ||
            p.joinType.sql == "CROSS") && !bounded(p.buildSide match {
              case BuildLeft => p.left
              case BuildRight => p.right
            }) =>
        Seq(Finding("unconditioned-nested-loop", name(p)))
      case p: WindowExec
          if p.partitionSpec.isEmpty && !bounded(p.child) =>
        Seq(Finding("single-partition-window", name(p)))
      case p: SortExec if p.global =>
        Seq(Finding("global-sort", name(p)))
    }.flatten
  }

  /** The audit as a DataFrame — (rule, n_findings) — for report
    * pipelines and the driver's oracle gate. */
  def report(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    audit(df).groupBy(_.rule).view.mapValues(_.size.toLong).toSeq.sorted
      .toDF("rule", "n_findings")
  }
}
