package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative subgraph algorithms over a symmetrized edge list `(a, b)`
  * (every undirected edge present in both directions): k-core peeling
  * (Seidman '83 / the Batagelj-Zaversnik cores algorithm, expressed as
  * bulk-synchronous rounds) and bounded-hop BFS from a seed set.
  *
  * Both follow the [[Components]] playbook for distributed graph loops:
  * the edge frame is persisted once, each round is ONE key-partitioned
  * shuffle (a semi-join of edges against the current node frame plus a
  * map-side-combinable degree/frontier aggregation), and the round count
  * is a bounded parameter — so a 1000-executor run does `rounds`
  * shuffles over data that only ever SHRINKS (peeling) or stays
  * frontier-sized (BFS), never a cross join or a driver-side collect.
  *
  * Round counts are explicit (not converge-until-fixed-point) so the
  * DuckDB oracle can unroll the identical computation — the Scala loop
  * and the SQL generator take the same `rounds`/`k` parameters, making
  * the whole trace hash-checkable. Callers pick `rounds` ≥ the fixture's
  * convergence depth; the trace makes convergence visible (equal tail
  * rows) rather than assumed.
  */
object GraphCore {

  /** One row per peel round `0..rounds`: the number of still-alive nodes
    * and undirected edges of the k-core iteration. alive₀ = all
    * endpoints; aliveᵢ₊₁ = nodes with ≥ k neighbors inside aliveᵢ. Once
    * the trace stabilizes, the fixed point IS the k-core.
    *
    * Iteration mechanics matter here more than in [[PageRank]]'s loop:
    * `alive` feeds BOTH sides of the induced-edge join, so a lazy
    * formulation DOUBLES the logical plan every round — exponential
    * analysis cost (the first cut of this operator spent 225 s
    * analyzing/re-deriving plans for 7 one-row aggregates). Each round
    * therefore ends in an eager `localCheckpoint`, truncating the
    * lineage to a constant-size plan; the per-round counts — which ARE
    * the operator's output — are ≤ rounds×3 longs of driver state, the
    * same bounded-statistics shape as a fit step. */
  def kCoreTrace(sym: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    val edges = sym.select(col("a"), col("b")).persist()
    var alive = edges.select(col("a")).distinct().localCheckpoint(true)
    val rows = Seq.newBuilder[(Int, Long, Long)]
    for (i <- 0 to rounds) {
      val induced = edges
        .join(alive, Seq("a"))
        .join(alive.withColumnRenamed("a", "b"), Seq("b"))
        .persist()
      rows += ((i, alive.count(), induced.count() / 2))
      if (i < rounds) {
        alive = induced.groupBy(col("a")).agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select(col("a")).localCheckpoint(true)
      }
      induced.unpersist(false)
    }
    edges.unpersist(false)
    rows.result().toDF("iter", "alive_nodes", "alive_edges")
  }

  /** DuckDB mirror of [[kCoreTrace]] over an existing CTE `symCte` with
    * columns (a, b). Emits per-round CTEs plus `kcore_trace`
    * (iter, alive_nodes, alive_edges). Every round CTE is
    * `AS MATERIALIZED`: each aliveᵢ is referenced twice by indᵢ and
    * once more downstream, so DuckDB's default inline expansion
    * re-derives the whole chain per reference — the same exponential
    * blowup [[kCoreTrace]]'s scaladoc describes on the Spark side
    * (observed: > 22 GB of spill at sf0.1 before materialization). */
  def sqlKCoreTraceCtes(symCte: String, k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"alive0 AS MATERIALIZED (SELECT DISTINCT a FROM $symCte)"
    for (i <- 0 to rounds) {
      sb ++= s""",
        ind$i AS MATERIALIZED (
          SELECT e.a FROM $symCte e
          JOIN alive$i x ON e.a = x.a
          JOIN alive$i y ON e.b = y.a)"""
      if (i < rounds) sb ++= s""",
        alive${i + 1} AS MATERIALIZED (
          SELECT a FROM ind$i GROUP BY a HAVING count(*) >= $k)"""
    }
    sb ++= s""",
      kcore_trace AS (${(0 to rounds).map(i =>
        s"""SELECT $i AS iter,
          (SELECT CAST(count(*) AS BIGINT) FROM alive$i) AS alive_nodes,
          (SELECT CAST(count(*) AS BIGINT) // 2 FROM ind$i) AS alive_edges""")
      .mkString(" UNION ALL ")})"""
    sb.toString
  }

  /** Minimum hop distance (≤ maxHops) from `seeds` (single column `a`)
    * to every reachable node: classic frontier expansion — each round
    * joins edges against only the PREVIOUS frontier and anti-joins the
    * visited set, so per-round work is proportional to the frontier, not
    * the graph. Returns (a, hop). */
  def bfsHops(sym: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val edges = sym.select(col("a"), col("b")).persist()
    var dist = seeds.select(col("a")).distinct()
      .withColumn("hop", lit(0)).persist()
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("hop") === h - 1).select(col("a"))
      val next = edges.join(frontier, Seq("a"))
        .select(col("b").as("a")).distinct()
        .join(dist.select(col("a")), Seq("a"), "left_anti")
        .withColumn("hop", lit(h))
      // eager checkpoint: `dist` feeds the frontier filter, the
      // anti-join AND the union, so a lazy chain would triple the plan
      // per hop (see kCoreTrace's scaladoc for the failure mode)
      dist = dist.unionByName(next).localCheckpoint(true)
    }
    dist
  }

  /** DuckDB mirror of [[bfsHops]]: `seedsCte` has column (a). Emits
    * per-hop CTEs plus `bfs_dist` (a, hop). */
  def sqlBfsHopsCtes(symCte: String, seedsCte: String,
      maxHops: Int): String = {
    val sb = new StringBuilder
    sb ++= s"dist0 AS MATERIALIZED (SELECT DISTINCT a, 0 AS hop FROM $seedsCte)"
    for (h <- 1 to maxHops) {
      sb ++= s""",
        dist$h AS MATERIALIZED (
          SELECT a, hop FROM dist${h - 1}
          UNION ALL
          SELECT f.a, $h AS hop FROM (
            SELECT DISTINCT e.b AS a FROM $symCte e
            JOIN dist${h - 1} d ON e.a = d.a AND d.hop = ${h - 1}) f
          WHERE f.a NOT IN (SELECT a FROM dist${h - 1}))"""
    }
    sb ++= s""",
      bfs_dist AS (SELECT a, hop FROM dist$maxHops)"""
    sb.toString
  }
}
