package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}

/** Analysis-time scale guard — the q246 failure class as an ENGINE check
  * instead of a test: a `Window` with an empty partition spec moves its
  * whole input to ONE partition, which is fine over a bounded frame
  * (months, digit groups, bucket totals — always downstream of an
  * aggregation or limit) and a cluster-melter over raw rows (`ntile(10)
  * OVER (ORDER BY score)` at 100 TB single-threads every user through
  * one sort). The guard walks each unpartitioned window's input subtree
  * and throws if it reaches a leaf relation with NO cardinality-
  * collapsing operator (Aggregate / Limit) in between — the exact
  * criterion PlanSpec's catalog audit enforces, available to users at
  * runtime before a job is submitted.
  *
  * Two installation paths, mirroring [[graft.GraftExtensions]]:
  *  - declarative: the extension injects this as a `checkRule`, gated by
  *    `spark.graft.scaleGuard=true` (default off, so deliberately
  *    bounded global windows stay expressible without ceremony);
  *  - imperative: `ScaleGuard.assertScalable(df)` before launching.
  *
  * `LocalRelation` (driver-local literal frames — lookup tables, rank
  * spines) is a safe leaf: it is bounded by construction.
  */
object ScaleGuard {

  final class UnscalablePlanException(msg: String)
    extends IllegalStateException(msg)

  /** Throws [[UnscalablePlanException]] if the analyzed plan contains an
    * unpartitioned window over raw (non-collapsed) rows, or a
    * condition-free inner/cross join whose BOTH sides are raw — the full
    * n×m product (a broadcast of a bounded side shows up as a join over
    * a collapsed/local side and is allowed). */
  def check(plan: LogicalPlan): Unit = {
    val badWindows = plan.collect {
      case w: Window if w.partitionSpec.isEmpty && reachesRawRows(w.child) => w
    }
    if (badWindows.nonEmpty)
      throw new UnscalablePlanException(
        "unpartitioned window over raw rows — this moves the whole input " +
          "through ONE partition and cannot be saved by more executors. " +
          "Partition the window, pre-aggregate its input, or use the " +
          "bucketed graft.operators.PrefixSum rewrite for global " +
          s"ranks/cumsums. Offending window: ${badWindows.head.simpleString(3)}")
    val badJoins = plan.collect {
      case j: Join if j.condition.isEmpty &&
        (j.joinType == Inner || j.joinType == Cross) &&
        reachesRawRows(j.left) && reachesRawRows(j.right) => j
    }
    if (badJoins.nonEmpty)
      throw new UnscalablePlanException(
        "condition-free join with BOTH sides raw — a full n×m Cartesian " +
          "product. Add a join condition, or collapse one side (aggregate " +
          "/ limit) so it broadcasts as a bounded frame. Offending join: " +
          badJoins.head.simpleString(3))
  }

  /** Convenience form for the imperative path. */
  def assertScalable(df: DataFrame): Unit = check(df.queryExecution.analyzed)

  /** True iff the subtree reaches a non-local leaf with no cardinality-
    * collapsing operator on the path. */
  private def reachesRawRows(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: LocalLimit => false
    case _: LocalRelation => false
    case leaf if leaf.children.isEmpty => true
    case other => other.children.exists(reachesRawRows)
  }

  /** The check-rule builder [[graft.GraftExtensions]] injects: active only
    * when `spark.graft.scaleGuard=true` on the session. */
  def checkRule(session: SparkSession): LogicalPlan => Unit = { plan =>
    if (session.conf.getOption("spark.graft.scaleGuard").contains("true"))
      check(plan)
  }
}
