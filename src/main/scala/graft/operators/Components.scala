package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair graph — the exact clustering step of
  * near-duplicate dedup (pairs → dup CLUSTERS → one survivor per
  * cluster). [[NearDup.nearDupSurvivors]]'s one-pass policy equals
  * components only when clusters are cliques; chains (A~B~C with A≁C)
  * need the real thing.
  *
  * Algorithm: iterative min-label propagation — every vertex starts
  * labeled with its own id and repeatedly takes the minimum label among
  * itself and its neighbors, until a fixpoint. Each round is one shuffle
  * (edge⋈label join + min aggregation); rounds needed = graph diameter,
  * which for dup clusters is tiny (they are near-cliques). Each round's
  * result is persisted and the previous round freed, so lineage and
  * memory stay flat no matter the iteration count. At 100 TB scale with
  * long-diameter graphs, the large-star/small-star variant (Kiveris et
  * al. '14) halves rounds — not needed for dedup-shaped graphs.
  *
  * Deterministic: labels are ids, min is order-independent.
  */
object Components {

  /** (id, component) for every node, where component = the smallest id
    * reachable in the undirected pair graph. Nodes absent from `edges`
    * form singleton components.
    *
    * Throws if the fixpoint is not reached within `maxIter` rounds (graph
    * diameter exceeds it) — an unconverged labeling is silently WRONG
    * (split clusters), never an acceptable partial answer; raise maxIter
    * for long-chain graphs. The returned frame is persisted
    * (MEMORY_AND_DISK) — callers that are done with it should
    * `unpersist()` it in long-lived sessions. */
  def connectedComponents(nodes: DataFrame, idCol: String,
      edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var comp = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym.join(comp, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
      val updated = comp.as("c")
        .join(neighborMin, col("c.id") === col("src"), "left")
        .select(col("c.id").as("id"),
          least(col("c.comp"), coalesce(col("ncomp"), col("c.comp"))).as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = updated.as("u")
        .join(comp.as("p"), col("u.id") === col("p.id"))
        .filter(col("u.comp") =!= col("p.comp"))
        .count()
      comp.unpersist()
      comp = updated
      converged = changed == 0
      i += 1
    }
    sym.unpersist()
    if (!converged) {
      comp.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — " +
          "the graph diameter exceeds maxIter; raise it (rounds are cheap: " +
          "one shuffle each) rather than consuming a split clustering")
    }
    comp
  }

  /** Exact dedup survivors: the smallest id of every component (the
    * component label itself), one row per cluster — correct for chain
    * topologies where the one-pass policy would over- or under-delete. */
  def componentSurvivors(nodes: DataFrame, idCol: String,
      edges: DataFrame): DataFrame =
    connectedComponents(nodes, idCol, edges)
      .groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .select(col("comp").as(idCol), col("cluster_size"))
}
