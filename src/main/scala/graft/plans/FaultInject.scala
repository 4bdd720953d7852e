package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, UnaryExecNode}

/** Task-failure injection for the execution-environment invariance matrix
  * (COVERAGE.md): with `spark.graft.faultInject=true` on a session whose
  * master allows retries (e.g. `local[4,4]`), every parquet scan gets a
  * pass-through node that THROWS on the first attempt of every third
  * partition. A 100 TB job loses tasks to OOM-kills, preemption and bad
  * hosts as a matter of course; Spark's contract is that retried tasks
  * recompute their partition from lineage and the answer is unchanged.
  * Any operator that breaks under that contract (per-partition state that
  * leaks across attempts, non-idempotent side effects inside a task,
  * commit-protocol misuse in a writer) turns into an oracle hash mismatch
  * or a job failure under this row, while staying invisible in every
  * clean-run sweep.
  *
  * The rule is injected via `injectQueryStagePrepRule`, i.e. it runs under
  * AQE after `EnsureRequirements` — the wrapper reports its child's
  * partitioning/ordering so no new exchanges appear in response, and the
  * later transition/codegen rules treat it as an ordinary row-based node.
  * Streaming microbatch plans never pass through AQE stage prep, so the
  * streaming twins are exercised by the chaos-kill row instead (see
  * [[graft.tools.ChaosKillListener]]).
  */
object FaultInject {
  val CONF = "spark.graft.faultInject"

  /** Fail the first attempt of every third partition — partition 0 included,
    * so single-task jobs (the Verify `coalesce(1)` writers) are covered. */
  val SAMPLE_MOD = 3

  def rule(session: SparkSession): Rule[SparkPlan] = new Rule[SparkPlan] {
    override def apply(plan: SparkPlan): SparkPlan = {
      val on = session.conf.getOption(CONF).exists(_.toBoolean)
      // idempotency PER SCAN, not per subtree: an AQE re-planned subtree
      // can mix one already-wrapped scan with a newly exposed bare one —
      // a whole-subtree `plan.exists(FaultInjectExec)` guard would leave
      // the new scan uninjected. transformUp wraps every bare scan; the
      // collapse case then unwraps the double wrapper the bottom-up pass
      // creates around scans that were already injected.
      if (!on) plan
      else plan.transformUp {
        case scan: FileSourceScanExec => FaultInjectExec(scan)
        case FaultInjectExec(FaultInjectExec(scan)) => FaultInjectExec(scan)
      }
    }
  }
}

case class FaultInjectExec(child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber == 0 &&
          tc.partitionId % FaultInject.SAMPLE_MOD == 0)
        throw new RuntimeException(
          s"graft-fault-inject: first attempt of partition ${tc.partitionId}")
      it
    }, preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
