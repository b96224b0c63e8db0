package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Pre-flight plan lint as a LIBRARY API — the checks this repo's own
  * PlanLintSpec runs over the registry, exposed so a pipeline user can
  * gate THEIR queries before paying for them on a 1000-executor
  * cluster (`PlanGuard.lint(df)` in a CI test, or `assertClean` right
  * before a production `write`). Everything here inspects the compiled
  * physical plan only — nothing is executed.
  *
  * Findings, in descending severity:
  *   - `cartesian-product`: an unkeyed join — O(|L|·|R|) at any scale.
  *   - `nested-loop-join`: usually a dropped equi-key or a non-equi
  *     predicate; legitimate ONLY for 1-row/tiny broadcast totals
  *     (pass such frames' row bound via `allowNestedLoop`).
  *   - `unpruned-wide-scan`: a file scan reading ≥ `wideScanCols`
  *     columns — a projection missing before the scan (column pruning
  *     did not engage).
  *   - `single-partition-exchange`: a shuffle INTO one partition (the
  *     global-sort / global-window shape) under a non-trivial subtree;
  *     1-row aggregates don't trip it because their exchange carries
  *     only partial-agg rows.
  *
  * The thresholds are contracts, not heuristics: each mirrors an
  * invariant this repo's registry maintains (see PlanLintSpec and
  * SCALING.md) — a query that trips one either needs a rewrite or an
  * explicit allow.
  */
object PlanGuard {

  final case class Finding(kind: String, node: String, detail: String) {
    override def toString = s"[$kind] $node: $detail"
  }

  /** Lint a DataFrame's physical plan. Pure inspection, no execution.
    *
    * @param allowNestedLoop permit BroadcastNestedLoopJoin when its
    *        build side is an aggregate (the 1-row-totals pattern)
    * @param wideScanCols flag scans reading at least this many columns
    */
  def lint(df: DataFrame, allowNestedLoop: Boolean = true,
      wideScanCols: Int = 12): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan
    collect(stripAdaptive(plan), allowNestedLoop, wideScanCols)
  }

  /** Throw (with every finding listed) if the plan has any hazard —
    * the CI-gate form.
    */
  def assertClean(df: DataFrame, allowNestedLoop: Boolean = true,
      wideScanCols: Int = 12): Unit = {
    val fs = lint(df, allowNestedLoop, wideScanCols)
    if (fs.nonEmpty) throw new IllegalStateException(
      s"PlanGuard: ${fs.size} scale hazard(s):\n${fs.mkString("\n")}")
  }

  private def stripAdaptive(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def collect(p: SparkPlan, allowNl: Boolean,
      wideCols: Int): Seq[Finding] = {
    val here: Seq[Finding] = p match {
      case c: CartesianProductExec =>
        Seq(Finding("cartesian-product", c.nodeName,
          "unkeyed join multiplies both inputs"))
      case j: BroadcastNestedLoopJoinExec =>
        // the blessed shape: a broadcast build side that is itself an
        // aggregate (1-row totals / tiny normalizer frames)
        val buildIsAgg = j.buildSide.toString.contains("BuildRight") &&
          j.right.find(_.nodeName.contains("HashAggregate")).isDefined ||
          j.buildSide.toString.contains("BuildLeft") &&
          j.left.find(_.nodeName.contains("HashAggregate")).isDefined
        if (allowNl && buildIsAgg) Nil
        else Seq(Finding("nested-loop-join", j.nodeName,
          "non-equi or keyless join; broadcast side not a 1-row aggregate"))
      case s: FileSourceScanExec if s.output.size >= wideCols =>
        Seq(Finding("unpruned-wide-scan", s.nodeName,
          s"scan reads ${s.output.size} columns (" +
            s.output.take(4).map(_.name).mkString(", ") + ", ...)"))
      case e: ShuffleExchangeExec
        if e.outputPartitioning.numPartitions == 1 &&
          e.child.find(_.isInstanceOf[FileSourceScanExec]).isDefined &&
          e.child.find(_.nodeName.contains("HashAggregate")).isEmpty =>
        Seq(Finding("single-partition-exchange", e.nodeName,
          "shuffles raw rows into ONE partition (global sort/window?)"))
      case _ => Nil
    }
    here ++ p.children.flatMap(collect(_, allowNl, wideCols))
  }
}
