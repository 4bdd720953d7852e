package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Deduplicate, EventTimeWatermark, GlobalLimit, Join, LocalLimit, LocalRelation, LogicalPlan, Range, ResolvedHint, SubqueryAlias, Window}
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
  def check(plan: LogicalPlan): Unit = check(plan, skipRootJoin = false)

  /** `skipRootJoin` is set ONLY by the injected session check rule:
    * Dataset.join(right, usingColumns) internally analyzes a TRANSIENT
    * `Join(l, r, Inner, None)` ROOT plan to disambiguate self-join
    * attributes before attaching the USING condition, so a session rule
    * sees that artifact for every healthy using-join whose sides aren't
    * collapsed. Every real execution path (write, any projection /
    * aggregation / command on top) puts the join below the root, where
    * the check applies in full — and the imperative [[assertScalable]]
    * keeps the root check. */
  private def check(plan: LogicalPlan, skipRootJoin: Boolean): Unit = {
    val badWindows = plan.collect {
      case w: Window if w.partitionSpec.isEmpty && reachesRawRows(w.child) => w
    }
    if (badWindows.nonEmpty)
      throw new UnscalablePlanException(
        "unpartitioned window over raw rows — this moves the whole input " +
          "through ONE partition and cannot be saved by more executors. " +
          "Partition the window, pre-aggregate its input, or use the " +
          "bucketed graft.operators.PrefixSum rewrite for global " +
          s"ranks/cumsums. Offending window: ${badWindows.head.treeString.linesIterator.take(10).mkString("; ")}")
    val badJoins = plan.collect {
      case j: Join if !(skipRootJoin && (j eq plan) && isUsingArtifact(j)) &&
        j.condition.isEmpty &&
        (j.joinType == Inner || j.joinType == Cross) &&
        reachesRawRows(j.left) && reachesRawRows(j.right) => j
    }
    if (badJoins.nonEmpty)
      throw new UnscalablePlanException(
        "condition-free join with BOTH sides raw — a full n×m Cartesian " +
          "product. Add a join condition, or collapse one side (aggregate " +
          "/ limit) so it broadcasts as a bounded frame. Offending join: " +
          badJoins.head.treeString.linesIterator.take(14).mkString("; "))
    // Streaming face of the same contract: a plain `dropDuplicates` on a
    // stream keeps one state row per distinct key FOREVER unless the
    // EVENT-TIME column is among the dedup keys (Spark evicts dedup state
    // only for keys carrying the watermark metadata — a watermark
    // elsewhere in the plan does NOT bound this operator's state). At
    // 100 TB/day that is the state store growing without bound until the
    // job dies. Either include the watermarked column in the keys, or use
    // `dropDuplicatesWithinWatermark` (a different operator, watermark-
    // evicted by construction) — the engine's own EventStreams.dedupEvents
    // does the latter.
    if (plan.isStreaming) {
      val badDedups = plan.collect {
        case d: Deduplicate if d.child.isStreaming &&
          !d.keys.exists(_.metadata.contains(EventTimeWatermark.delayKey)) => d
      }
      if (badDedups.nonEmpty)
        throw new UnscalablePlanException(
          "streaming dropDuplicates whose keys carry no event-time " +
            "watermark — state grows without bound (one row per distinct " +
            "key, never evicted). Include the watermarked column in the " +
            "dedup keys, or use dropDuplicatesWithinWatermark. Offending: " +
            badDedups.head.simpleString(3))
    }
  }

  /** Shape of the transient Dataset.join(usingColumns) disambiguation
    * artifact the session-rule root exemption exists for: an INNER join
    * with no condition whose sides share at least one output name (USING
    * requires same-named columns on both sides). A bare `a.crossJoin(b)`
    * (Cross) or a condition-free join of disjoint schemas at the root is
    * NOT the artifact and stays guarded even under `skipRootJoin`. */
  private def isUsingArtifact(j: Join): Boolean =
    j.joinType == Inner && {
      val leftNames = j.left.output.map(_.name.toLowerCase).toSet
      j.right.output.exists(a => leftNames.contains(a.name.toLowerCase))
    }

  /** Convenience form for the imperative path. */
  def assertScalable(df: DataFrame): Unit = check(df.queryExecution.analyzed)

  /** Alias name [[bounded]] plants and [[reachesRawRows]] honors. */
  val BoundedMarker = "graft_bounded"

  /** Explicit, auditable boundedness claim for frames whose collapsed
    * provenance the analyzer can no longer see — above all
    * `localCheckpoint()` outputs (a checkpoint severs lineage into a
    * `LogicalRDD` leaf, so a bin/centroid/day frame that was built by an
    * aggregation reads as "raw" afterwards). Semantically a no-op
    * (`df.alias`); every call site must carry a comment stating WHY the
    * frame is bounded, and the claim is greppable
    * (`ScaleGuard.bounded`). Do NOT use it to silence the guard on a
    * frame whose size grows with the data — that is exactly the bug the
    * guard exists to catch. */
  def bounded(df: DataFrame): DataFrame = df.alias(BoundedMarker)

  /** True iff the subtree reaches a non-local leaf with no cardinality-
    * collapsing (or boundedness-claiming) operator on the path:
    *  - `Aggregate` / `Limit` collapse cardinality to group/limit counts;
    *  - `LocalRelation` (driver-local literals) and `Range` (literal
    *    endpoints) are bounded by construction;
    *  - an explicit `broadcast()` hint is a boundedness CLAIM the author
    *    already stakes at runtime — a broadcast side must fit in driver +
    *    executor memory, so an unbounded one fails loudly there, never
    *    silently as a mis-scaled shuffle;
    *  - the [[bounded]] marker (see its contract above). */
  private def reachesRawRows(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: LocalLimit => false
    case _: LocalRelation | _: Range => false
    case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => false
    case SubqueryAlias(id, _) if id.name == BoundedMarker => false
    case leaf if leaf.children.isEmpty => true
    case other => other.children.exists(reachesRawRows)
  }

  /** The check-rule builder [[graft.GraftExtensions]] injects: active only
    * when `spark.graft.scaleGuard=true` on the session. */
  def checkRule(session: SparkSession): LogicalPlan => Unit = { plan =>
    if (session.conf.getOption("spark.graft.scaleGuard").contains("true"))
      check(plan, skipRootJoin = true)
  }
}
