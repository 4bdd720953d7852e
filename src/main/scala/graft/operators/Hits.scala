package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration HITS (Kleinberg '99) in EXACT integer arithmetic —
  * hub/authority scores for directed (especially bipartite) graphs:
  * who are the authoritative sellers, and which buyers' edges confer
  * that authority. The mutual-reinforcement sibling of [[PageRank]]:
  * authority(i) = Σ hub(j) over j→i, hub(j) = Σ authority(i) over j→i,
  * renormalized each half-step.
  *
  * Float HITS is unreproducible at scale for the usual reason
  * (combine-order float sums). Here scores are integers scaled by 10^5
  * and the per-half-step normalization is `(x · 10^5) div max(x)` — a
  * deterministic floor division by the exact integer max, so every
  * engine/partitioning sheds identical ulps and a DuckDB unrolled-CTE
  * chain reproduces the scores bit-for-bit. Σh over in-edges ≤
  * n·10^5 and the ·10^5 rescale keeps everything < 2^63 for graphs up
  * to ~9·10^8 nodes — beyond that, drop Scale a decade.
  *
  * Unlike PageRank no dangling-node guard is needed: the authority
  * frame ranges over DISTINCT dst (every one has an in-edge by
  * construction) and the hub frame over DISTINCT src.
  *
  * Scale shape: the edge frame is persisted once; each round is two
  * keyed join+sum shuffles plus two single-row max aggregates
  * (broadcast). Raw-score frames are eagerly localCheckpoint'ed per
  * round — each is referenced twice (max + normalize), the
  * double-reference plan-blowup lesson of Components/GraphCore.
  */
object Hits {

  val Scale = 100000L // 10^5: integer score scale

  /** (node, authority, hub) after `iters` full rounds; scores are
    * integer-scaled by [[Scale]] (max node = Scale by construction).
    * Nodes appearing only as src have authority 0; only as dst, hub 0.
    * Edges should be DISTINCT pairs (dedupe upstream if multiplicity
    * is not meant to weight the graph). */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20], got $iters")
    val ed = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var h = ed.select(col("src").as("node")).distinct()
      .withColumn("h", lit(Scale))
    var a: DataFrame = null
    var i = 0
    while (i < iters) {
      val araw = ed.join(h, ed("src") === h("node"))
        .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
        .localCheckpoint(true)
      val amax = araw.agg(max(col("ar")).as("am"))
      a = araw.crossJoin(broadcast(amax))
        .select(col("dst").as("node"), expr(s"(ar * $Scale) div am").as("a"))
      val hraw = ed.join(a, ed("dst") === a("node"))
        .groupBy(col("src")).agg(sum(col("a")).as("hr"))
        .localCheckpoint(true)
      val hmax = hraw.agg(max(col("hr")).as("hm"))
      h = hraw.crossJoin(broadcast(hmax))
        .select(col("src").as("node"), expr(s"(hr * $Scale) div hm").as("h"))
      i += 1
    }
    a.join(h, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("a"), lit(0L)).as("authority"),
        coalesce(col("h"), lit(0L)).as("hub"))
  }

  /** DuckDB mirror of [[ranks]] over an edge CTE named `hits_edges`
    * (columns src, dst): emits an unrolled CTE chain per round (the
    * repo's established iterative-oracle shape — materialized so the
    * round frames are computed once, not inline-expanded), ending in
    * `hits_final` (node, authority, hub). */
  def sqlRanksCtes(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""h0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, CAST($Scale AS BIGINT) AS h
      FROM hits_edges)""")
    for (r <- 1 to iters) {
      val hPrev = s"h${r - 1}"
      sb.append(s""",
    a${r}_raw AS MATERIALIZED (
      SELECT e.dst, CAST(sum(p.h) AS BIGINT) AS ar
      FROM hits_edges e JOIN $hPrev p ON e.src = p.node
      GROUP BY 1),
    a$r AS MATERIALIZED (
      SELECT dst AS node,
        CAST((ar * $Scale) // (SELECT max(ar) FROM a${r}_raw) AS BIGINT) AS a
      FROM a${r}_raw),
    h${r}_raw AS MATERIALIZED (
      SELECT e.src, CAST(sum(q.a) AS BIGINT) AS hr
      FROM hits_edges e JOIN a$r q ON e.dst = q.node
      GROUP BY 1),
    h$r AS MATERIALIZED (
      SELECT src AS node,
        CAST((hr * $Scale) // (SELECT max(hr) FROM h${r}_raw) AS BIGINT) AS h
      FROM h${r}_raw)""")
    }
    sb.append(s""",
    hits_final AS (
      SELECT coalesce(a.node, h.node) AS node,
        coalesce(a.a, 0) AS authority,
        coalesce(h.h, 0) AS hub
      FROM a$iters a FULL OUTER JOIN h$iters h ON a.node = h.node)""")
    sb.toString
  }
}
