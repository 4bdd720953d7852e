package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, InputAdapter, SortExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Scale-relevant fingerprint of a physical plan: counts of the node
  * classes that decide whether a plan survives a 1000-executor cluster
  * (exchanges, join strategies, global vs partitioned sorts/windows,
  * aggregate modes) plus, per parquet scan, the table, the width of the
  * pruned read schema, and whether data/partition filters reached it.
  *
  * The catalog-wide fixture (`src/test/resources/plan_fingerprints.txt`,
  * asserted by PlanSpec) pins every query's fingerprint, so a silent
  * plan regression — a broadcast join degrading to sort-merge, a scan
  * losing column pruning or filter pushdown, an extra shuffle from a
  * lost partitioning — fails the suite with a one-line diff instead of
  * surfacing rounds later as a bench riser. Deliberately EXCLUDES
  * Project/Filter node counts and any partition counts: those churn on
  * benign refactors and conf, while the listed classes only change when
  * the execution strategy itself changes.
  */
object PlanFingerprint {

  /** One line, stable key order: `bhj=1 hagg=2 xchg=1 scans=lineitem(2,pf)`.
    * Scans sort lexicographically; only nonzero counts appear.
    *
    * Feed this the EXECUTED plan (`qe.executedPlan`), not `sparkPlan`:
    * exchanges only exist after EnsureRequirements, and the shuffle
    * count is the single most scale-relevant number here. Pre-execution
    * wrappers are traversed transparently (AQE root → its current plan,
    * query stages → their plan, codegen spans → child), so the
    * fingerprint is the logical execution shape, not the wrapper
    * layout; a ReusedExchange counts as `reuse` without re-counting the
    * shared subtree. InMemoryTableScan (an operator's own persist)
    * counts as an opaque `cache` leaf — its cached plan was already
    * planned once wherever persist was called.
    */
  def of(plan: SparkPlan): String = {
    val counts = scala.collection.mutable.SortedMap.empty[String, Int]
    def bump(k: String): Unit = counts(k) = counts.getOrElse(k, 0) + 1
    val scans = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case w: WholeStageCodegenExec => walk(w.child)
      case i: InputAdapter          => walk(i.child)
      case _: ReusedExchangeExec    => bump("reuse")
      case f: FileSourceScanExec =>
        val table = f.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        val pushed = f.metadata.getOrElse("PushedFilters", "[]") != "[]"
        val partf = f.metadata.getOrElse("PartitionFilters", "[]") != "[]"
        val flags = (if (pushed) ",pf" else "") + (if (partf) ",partf" else "")
        scans += s"$table(${f.requiredSchema.fields.length}$flags)"
        bump("scan")
      case n =>
        n match {
          case _: ShuffleExchangeExec       => bump("xchg")
          case _: BroadcastExchangeExec     => bump("bxchg")
          case _: BroadcastHashJoinExec     => bump("bhj")
          case _: SortMergeJoinExec         => bump("smj")
          case _: ShuffledHashJoinExec      => bump("shj")
          case _: BroadcastNestedLoopJoinExec => bump("bnlj")
          case _: CartesianProductExec      => bump("cart")
          case s: SortExec                  => bump(if (s.global) "gsort" else "lsort")
          case w: WindowExec                => bump(if (w.partitionSpec.isEmpty) "gwin" else "pwin")
          case _: HashAggregateExec         => bump("hagg")
          case _: ObjectHashAggregateExec   => bump("oagg")
          case _: SortAggregateExec         => bump("sagg")
          case _: TakeOrderedAndProjectExec => bump("topn")
          case _: InMemoryTableScanExec     => bump("cache")
          case _                            => ()
        }
        n.children.foreach(walk)
    }
    walk(plan)
    val parts = counts.toSeq.map { case (k, v) => s"$k=$v" } ++
      (if (scans.nonEmpty) Seq("scans=" + scans.sorted.mkString("+")) else Nil)
    parts.mkString(" ")
  }
}
