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
  * result is persisted, the previous round freed, AND the logical plan
  * rebased onto the cached rows — persist alone does not truncate plans,
  * and the body's two references to the running labeling would otherwise
  * double the plan tree per round (analysis OOMs near round 25; pinned by
  * PropertySpec's path-graph test). The truncation trade: losing a cached
  * block recomputes through earlier rounds, so production long-diameter
  * runs should add a reliable `checkpoint()` every ~10 rounds; and at
  * 100 TB scale the large-star/small-star variant (Kiveris et al. '14)
  * cuts round count from diameter to ~log(diameter) — neither needed for
  * dedup-shaped near-clique graphs.
  *
  * Deterministic: labels are ids, min is order-independent.
  */
object Components {

  /** (id, component) for every node, where component = the smallest id
    * reachable in the undirected pair graph. Nodes absent from `edges`
    * form singleton components.
    *
    * The `edges` frame is persisted and materialized exactly ONCE before
    * the symmetrizing union references it twice — edge pipelines are
    * typically the most expensive subtree of a dedup job (MinHash
    * shingle→band→verify), and Spark recomputes un-persisted subtrees
    * per reference. An empty edge set short-circuits: every node is its
    * own singleton component, no propagation rounds at all.
    *
    * The convergence check is folded into the update pass: each round's
    * frame carries a `chg` flag (did this node's label drop?) computed
    * from columns already present, so deciding convergence is a filter +
    * count over the freshly cached round — no extra join against the
    * previous labeling.
    *
    * Throws if the fixpoint is not reached within `maxIter` rounds (graph
    * diameter exceeds it) — an unconverged labeling is silently WRONG
    * (split clusters), never an acceptable partial answer; raise maxIter
    * for long-chain graphs. The returned frame is persisted
    * (MEMORY_AND_DISK) and all loop intermediates are freed before
    * returning; callers that are done with it should `unpersist()` it in
    * long-lived sessions ([[componentSurvivors]] does). */
  def connectedComponents(nodes: DataFrame, idCol: String,
      edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val e = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the edge pipeline once, BEFORE the union below makes two
    // references to it (a cold cache + two concurrent union legs would
    // still compute the subtree twice); the count doubles as the
    // empty-graph early exit
    val nEdges = e.count()
    if (nEdges == 0) {
      val all = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.unpersist()
      return all
    }
    // r13: iterate over the EDGE-TOUCHED vertices only. A vertex with no
    // edge keeps comp = id through every round by construction, yet the
    // round-12 loop re-persisted and re-counted it `diameter` times —
    // on dedup-shaped graphs the edge-touched set is a small fraction of
    // the corpus (pairs are the exception, not the rule), so every
    // per-round persist/scan/convergence-count now runs on |endpoints|
    // rows instead of |V| (guide §1.2 per-row work, §5 cache volume).
    // The node table is scanned and persisted ONCE, flagged by a single
    // left join against the endpoint set (same one-pass cost the old
    // round-0 persist paid); the loop filters the flagged slice and the
    // unflagged singletons rejoin after the fixpoint, labeled comp = id
    // straight off the cache.
    val endpoints = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val marked = nodes.select(col(idCol).as("id"))
      .join(endpoints.select(col("id"), lit(true).as("__e")), Seq("id"), "left")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var comp = marked.filter(col("__e"))
      .select(col("id"), col("id").as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // symmetrized view over the cached edges: two cache scans + a
    // projection per round — cheaper than persisting a second 2× copy
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    var converged = false
    var i = 0
    // the loop body references `comp` TWICE (neighbor scan + update join),
    // so without truncation the logical plan tree doubles every round —
    // ~2^i nodes by round i; Catalyst analysis alone OOMs near round 25 on
    // long-diameter graphs (pinned by PropertySpec's 1000-node path).
    // Caching does NOT truncate plans, so each round's result is rebased
    // onto a LogicalRDD over its cached rows: constant-depth plans, and
    // the scan still serves from the persisted frame. Trade documented in
    // the scaladoc: recompute-on-block-loss cascades to earlier rounds;
    // production long-diameter runs should reliable-checkpoint every ~10
    // rounds instead.
    var cached = comp // the currently-persisted frame backing `comp`
    while (!converged && i < maxIter) {
      val neighborMin = sym.join(comp, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
      val updated = comp.as("c")
        .join(neighborMin, col("c.id") === col("src"), "left")
        .select(col("c.id").as("id"),
          least(col("c.comp"), coalesce(col("ncomp"), col("c.comp"))).as("comp"),
          (coalesce(col("ncomp"), col("c.comp")) < col("c.comp")).as("chg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = updated.filter(col("chg")).count()
      cached.unpersist()
      cached = updated
      comp = updated.sparkSession.createDataFrame(updated.rdd, updated.schema)
      converged = changed == 0
      i += 1
    }
    if (!converged) {
      marked.unpersist()
      cached.unpersist()
      e.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — " +
          "the graph diameter exceeds maxIter; raise it (rounds are cheap: " +
          "one shuffle each) rather than consuming a split clustering")
    }
    // re-cache the narrow (id, comp) result — singletons (vertices with
    // no edge) rejoin here, labeled comp = id by a cache-local filter of
    // the marked node frame — and free the node/loop/edge caches: the
    // caller sees exactly one persisted frame, served from cache, with
    // nothing else pinned
    val singles = marked.filter(col("__e").isNull)
      .select(col("id"), col("id").as("comp"))
    val result = comp.select(col("id"), col("comp")).union(singles)
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    marked.unpersist()
    cached.unpersist()
    e.unpersist()
    result
  }

  /** Connected components by alternating large-star / small-star edge
    * rewriting (Kiveris et al. '14, "Connected Components in MapReduce and
    * Beyond") — the long-diameter scale path. [[connectedComponents]]'
    * min-label propagation needs exactly `diameter` rounds (a 1000-node
    * path needs 999); the star operations contract paths toward the
    * component minimum geometrically, converging in O(log² n) rounds on
    * adversarial topologies (the same 1000-node path converges in ~10 —
    * pinned by PropertySpec). Per phase: one window-min shuffle over the
    * symmetrized edges, no joins; the per-node minimum is computed with a
    * partition-local min window (map-side combinable), edges stay (long,
    * long) rows throughout.
    *
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m = min(Γ(u) ∪ {u})
    *  - small-star(u): every neighbor v < u re-attaches to m, and u
    *    itself links to m
    *
    * Both emit (child, m) with child > m, so self-loops vanish and the
    * fixpoint is a star forest: every non-root carries exactly one edge to
    * its component minimum. Convergence = the edge SET is unchanged by a
    * full large+small round (checked exactly: equal counts + empty
    * `exceptAll`, not a hash signature that could collide silently). Same
    * lineage discipline as the label loop: each round's edges are
    * persisted, the previous freed, and the plan rebased onto the cached
    * rows. Deterministic: min is order-independent. Loud-fails past
    * `maxIter` like [[connectedComponents]]. */
  def alternatingComponents(nodes: DataFrame, idCol: String,
      edges: DataFrame, maxIter: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val init = edges
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var nEdges = init.count()
    val singletons = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
    if (nEdges == 0) {
      init.unpersist()
      val out = singletons.persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      return out
    }
    def phase(e: DataFrame, large: Boolean): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val out = if (large) {
        // large-star(u): m = min(Γ(u) ∪ {u}); every neighbor v > u
        // re-attaches to m
        sym
          .withColumn("m", least(col("src"),
            min(col("dst")).over(Window.partitionBy(col("src")))))
          .filter(col("dst") > col("src"))
          .select(col("dst").as("src"), col("m").as("dst"))
      } else {
        // small-star(u): over the SMALLER neighbors only (the paper's
        // rule), m = min(N⁻(u) ∪ {u}); each v ∈ N⁻(u) and u itself
        // re-attach to m. Local minima emit nothing — their edges
        // reappear from the larger endpoint's perspective.
        val smaller = sym.filter(col("dst") < col("src"))
        val withMin = smaller
          .withColumn("m", min(col("dst")).over(Window.partitionBy(col("src"))))
        withMin.select(col("dst").as("src"), col("m").as("dst"))
          .union(withMin.select(col("src"), col("m")))
      }
      out.filter(col("src") =!= col("dst")).distinct()
    }
    var e = init
    var cached = init
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = phase(phase(e, large = true), large = false)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nNext = next.count()
      // exact set equality: counts match and nothing in next is absent
      // from the previous round (both sides are distinct by construction)
      converged = nNext == nEdges && next.exceptAll(e).isEmpty
      cached.unpersist()
      cached = next
      e = next.sparkSession.createDataFrame(next.rdd, next.schema)
      nEdges = nNext
      i += 1
    }
    if (!converged) {
      cached.unpersist()
      throw new IllegalStateException(
        s"alternatingComponents did not converge within $maxIter rounds — " +
          "pathological growth; raise maxIter (rounds contract the graph " +
          "geometrically) rather than consuming a split clustering")
    }
    // Star-forest validation (loud, two cheap jobs over the small final
    // edge set): every child has exactly one parent, and no parent is
    // itself a child. Converts any non-star fixpoint of the composite
    // map — which would silently mislabel — into an error.
    val multiParent = e.groupBy(col("src")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
    val chained = e.alias("x").join(e.alias("y"), col("x.dst") === col("y.src"))
    if (!multiParent.isEmpty || !chained.isEmpty) {
      cached.unpersist()
      throw new IllegalStateException(
        "alternatingComponents fixpoint is not a star forest — refusing " +
          "to read off a labeling from a malformed edge set")
    }
    val roots = e.groupBy(col("src").as("id")).agg(min(col("dst")).as("r"))
    val result = singletons.as("n")
      .join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("r"), col("comp")).as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    cached.unpersist()
    result
  }

  /** Exact dedup survivors: the smallest id of every component (the
    * component label itself), one row per cluster — correct for chain
    * topologies where the one-pass policy would over- or under-delete.
    *
    * The (much smaller) cluster table is materialized and the per-node
    * components frame unpersisted before returning, so no per-node cache
    * outlives the call. */
  def componentSurvivors(nodes: DataFrame, idCol: String,
      edges: DataFrame): DataFrame = {
    val comp = connectedComponents(nodes, idCol, edges)
    val out = comp
      .groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
      .select(col("comp").as(idCol), col("cluster_size"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    comp.unpersist()
    out
  }

  /** Quality-aware cluster representative selection: one row per
    * component carrying its best-scoring member (ties → smallest id) —
    * the "keep best" face of dedup. [[componentSurvivors]] (and
    * [[NearDup.nearDupSurvivors]]) keep the smallest id, which is the
    * convention for reproducibility; real training-data pipelines instead
    * keep the highest-QUALITY member of each near-dup cluster so the
    * surviving corpus is the best version of every document.
    *
    * `labeled` is a (member id, component, score) frame — compose from
    * [[connectedComponents]] joined to any scoring pass (token count,
    * quality signals, model scores). One hash-aggregation pass over the
    * component key: the winner is `max(struct(score, −id))`, a total
    * order (score desc, id asc), so the representative is unique and
    * engine-reproducible, with map-side partial aggregation and no
    * window/sort. */
  def representatives(labeled: DataFrame, idCol: String, compCol: String,
      scoreCol: String): DataFrame =
    labeled.groupBy(col(compCol))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col(scoreCol).as("s"), (-col(idCol)).as("negId"))).as("__b"))
      .select(col(compCol), col("n_members"),
        (-col("__b.negId")).as(s"rep_$idCol"),
        col("__b.s").as(s"rep_$scoreCol"))
}
