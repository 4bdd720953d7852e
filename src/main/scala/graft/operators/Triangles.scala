package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + global clustering coefficient over an undirected
  * edge list — the graph-cohesion audit for derived similarity/
  * co-occurrence graphs (is the near-dup graph a few dense cliques or a
  * loose web; how clustered is the part-co-purchase graph).
  *
  * Degree-oriented wedge join (the MapReduce-era standard, Suri &
  * Vassilvitskii '11): every edge is oriented from its lower-(degree,
  * id) endpoint to the higher, so a wedge is enumerated ONLY at its
  * smallest-degree apex — per-node wedge work is bounded by the oriented
  * out-degree (≤ √(2m) for any graph), which is what keeps a hub node
  * from exploding the join at 100 TB. Orientation compares (degree, id)
  * tuples directly in the join condition — no global rank window, no
  * single-partition sort.
  *
  * Every number is an exact integer except the final clustering
  * coefficient (one division, snapped to 8 decimals). A canonical
  * 3-way self-join computes the same count — that is the oracle.
  */
object Triangles {

  /** One-row graph metrics from a canonical edge list (a < b, distinct):
    * (n_nodes, n_edges, n_wedges, n_triangles, clustering) where
    * clustering = 3·triangles / wedges (NULL for wedge-free graphs). */
  def metrics(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val or = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = or.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("dd"))
    // wedges at the apex: pairs of oriented out-neighbors, ordered by the
    // same (degree, id) tuple so the closing edge's orientation is known
    val e1 = oriented.as("e1")
    val e2 = oriented.as("e2")
    val wedges = e1.join(e2,
      col("e1.src") === col("e2.src") &&
        (col("e1.dd") < col("e2.dd") ||
          (col("e1.dd") === col("e2.dd") && col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("v"), col("e2.dst").as("w"))
    // each wedge is unique per (apex, v, w) and the closing edge matches
    // at most once, so the inner-join count IS the triangle count
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    val nTri = wedges.join(closing, Seq("v", "w"))
      .agg(count(lit(1)).as("n_triangles"))
    val degAgg = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(d * (d - 1)) div 2").as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    degAgg.crossJoin(nEdges).crossJoin(nTri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles").cast("double")
            / col("n_wedges").cast("double"), 8)).as("clustering"))
  }

  /** DuckDB mirror of [[metrics]] over a canonical edge CTE named
    * `tri_edges` (columns a, b): a complete SELECT via the canonical
    * a<b<c 3-way join (count-equal to the oriented plan by symmetry). */
  def sqlMetrics: String = """
    WITH tri_deg AS (
      SELECT n, count(*) AS d FROM (
        SELECT a AS n FROM tri_edges UNION ALL SELECT b FROM tri_edges)
      GROUP BY n),
    tri_cnt AS (
      SELECT count(*) AS n_triangles
      FROM tri_edges e1
      JOIN tri_edges e2 ON e2.a = e1.b
      JOIN tri_edges e3 ON e3.a = e1.a AND e3.b = e2.b),
    tri_agg AS (
      SELECT (SELECT count(*) FROM tri_deg) AS n_nodes,
        (SELECT count(*) FROM tri_edges) AS n_edges,
        (SELECT CAST(sum(d * (d - 1)) AS BIGINT) // 2 FROM tri_deg) AS n_wedges,
        (SELECT n_triangles FROM tri_cnt) AS n_triangles)
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
      CASE WHEN n_wedges > 0 THEN
        round(3.0 * CAST(n_triangles AS DOUBLE)
          / CAST(n_wedges AS DOUBLE), 8)
      END AS clustering
    FROM tri_agg"""
}
