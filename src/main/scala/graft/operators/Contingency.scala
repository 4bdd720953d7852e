package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stable.{dsum, sqlDsum}

/** Chi-square independence test + Cramér's V between two categorical
  * columns — the "are these two labels actually related" audit behind
  * feature selection and dataset-composition checks (e.g. is `lang`
  * independent of `source`, or is one crawl feeding all the German).
  *
  * Shape: one (a, b) hash aggregation produces the contingency cells —
  * bounded by |A|·|B| rows, NOT input size — and every margin (row total,
  * column total, grand total) comes from window sums over that bounded
  * frame; the raw data is read once. Observed counts and margins are
  * exact integers; each cell's expected value and chi² contribution is a
  * fixed-shape double expression (deterministic IEEE), and the total is
  * an order-independent exact-decimal sum ([[dsum]]) — the same
  * stabilization every float aggregate in this engine uses.
  *
  * Cramér's V = √(χ² / (n·min(|A|−1, |B|−1))) normalizes χ² to [0, 1]
  * for comparability across tables of different shape.
  */
object Contingency {

  /** One-row result: (n, n_a, n_b, dof, chi2, cramers_v) for the
    * independence test of `aCol` × `bCol`. NULL categories are kept as
    * ordinary levels (a missing language is still a composition signal).
    * Degenerate 1×k tables (dof 0) yield NULL cramers_v. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val observed = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    // complete the grid: absent combinations are REAL zero cells whose
    // (0-e)^2/e contribution the test requires — the level cross product
    // is bounded by |A|·|B| (category cardinalities, not data size), so
    // the crossJoin is a broadcast of two tiny level frames. Null-safe
    // join: a NULL category is a level like any other.
    val grid = observed.select(col("a")).distinct()
      .crossJoin(observed.select(col("b")).distinct())
    val cells = grid.as("g").join(observed.as("c"),
        col("g.a") <=> col("c.a") && col("g.b") <=> col("c.b"), "left")
      .select(col("g.a").as("a"), col("g.b").as("b"),
        coalesce(col("c.o"), lit(0L)).as("o"))
    val byA = Window.partitionBy(col("a"))
    val byB = Window.partitionBy(col("b"))
    val all = Window.partitionBy()
    val withMargins = cells
      .withColumn("rt", sum(col("o")).over(byA))
      .withColumn("ct", sum(col("o")).over(byB))
      .withColumn("n", sum(col("o")).over(all))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val contrib = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
    val agg = withMargins
      .withColumn("contrib", contrib)
      .agg(max(col("n")).as("n"),
        // NULL is documented above as an ordinary level, but countDistinct
        // skips NULL — count it explicitly so n_a/n_b (and therefore dof
        // and Cramér's V) include a NULL level when one exists
        (countDistinct(col("a")) +
          max(col("a").isNull.cast("long"))).as("n_a"),
        (countDistinct(col("b")) +
          max(col("b").isNull.cast("long"))).as("n_b"),
        dsum(col("contrib")).as("chi2"))
    agg
      .withColumn("dof", (col("n_a") - 1) * (col("n_b") - 1))
      .withColumn("cramers_v",
        when(col("dof") > 0, round(sqrt(col("chi2") /
          (col("n").cast("double") *
            least(col("n_a") - 1, col("n_b") - 1).cast("double"))), 8)))
      .select(col("n"), col("n_a"), col("n_b"), col("dof"), col("chi2"),
        col("cramers_v"))
  }

  /** DuckDB mirror of [[chiSquare]] over `tbl` with category expressions
    * `aSql`/`bSql`: a complete SELECT (not a CTE body). */
  def sqlChiSquare(tbl: String, aSql: String, bSql: String): String = {
    val e = "CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)"
    s"""
    WITH observed AS (
      SELECT $aSql AS a, $bSql AS b, count(*) AS o
      FROM $tbl GROUP BY 1, 2),
    cells AS (
      SELECT g.a, g.b, coalesce(c.o, 0) AS o
      FROM (SELECT la.a, lb.b
            FROM (SELECT DISTINCT a FROM observed) la,
                 (SELECT DISTINCT b FROM observed) lb) g
      LEFT JOIN observed c
        ON g.a IS NOT DISTINCT FROM c.a AND g.b IS NOT DISTINCT FROM c.b),
    marg AS (
      SELECT a, b, o,
        CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS rt,
        CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS ct,
        CAST(sum(o) OVER () AS BIGINT) AS n
      FROM cells),
    agg AS (
      SELECT max(n) AS n,
        count(DISTINCT a) + max(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS n_a,
        count(DISTINCT b) + max(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS n_b,
        ${sqlDsum(s"(CAST(o AS DOUBLE) - $e) * (CAST(o AS DOUBLE) - $e) / ($e)")}
          AS chi2
      FROM marg)
    SELECT n, n_a, n_b, (n_a - 1) * (n_b - 1) AS dof, chi2,
      CASE WHEN (n_a - 1) * (n_b - 1) > 0 THEN
        round(sqrt(chi2 / (CAST(n AS DOUBLE)
          * CAST(least(n_a - 1, n_b - 1) AS DOUBLE))), 8)
      END AS cramers_v
    FROM agg"""
  }

  /** Mutual information I(A;B) in nats between two categorical columns,
    * with both marginal entropies and the normalized MI — the
    * feature-selection companion to [[chiSquare]]: χ² answers "is there
    * dependence", MI answers "how many bits of one label the other
    * carries" (redundant-feature pruning, dataset-composition audits).
    *
    * Same shape discipline as chiSquare: one (a, b) hash aggregation,
    * margins from groupBys over the BOUNDED cell frame, NULL kept as an
    * ordinary level (null-safe joins). Zero cells contribute 0 to MI by
    * the p·ln(p) limit, so no grid completion is needed. Each cell's
    * p·ln(pn/(p_a·p_b)) is a fixed-shape double snapped to 8 decimals
    * and summed as exact decimal (q92's PMI convention), so the result
    * is combine-order-independent.
    *
    * One-row result: (n, levels_a, levels_b, h_a_nats, h_b_nats,
    * mi_nats, nmi) where nmi = MI/√(H_A·H_B), NULL when either entropy
    * is 0 (a constant column carries no information to normalize by). */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val ma = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
    val mb = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
    val nt = cells.agg(sum(col("o")).as("n"))
    def snapSum(term: org.apache.spark.sql.Column) =
      round(sum(round(term, 8).cast("decimal(14,8)")), 6).cast("double")
    val nD = col("n").cast("double")
    val oD = col("o").cast("double")
    val miAgg = cells.as("c")
      .join(ma.as("m"), col("c.a") <=> col("m.a"))
      .join(mb.as("k"), col("c.b") <=> col("k.b"))
      .crossJoin(broadcast(nt))
      .agg(snapSum((oD / nD) * log(oD * nD /
        (col("ra").cast("double") * col("cb").cast("double")))).as("mi_nats"))
    val haAgg = ma.crossJoin(broadcast(nt))
      .agg(count(lit(1)).as("levels_a"),
        snapSum(-(col("ra").cast("double") / nD)
          * log(col("ra").cast("double") / nD)).as("h_a_nats"))
    val hbAgg = mb.crossJoin(broadcast(nt))
      .agg(count(lit(1)).as("levels_b"),
        snapSum(-(col("cb").cast("double") / nD)
          * log(col("cb").cast("double") / nD)).as("h_b_nats"))
    nt.crossJoin(broadcast(haAgg)).crossJoin(broadcast(hbAgg))
      .crossJoin(broadcast(miAgg))
      .select(col("n"), col("levels_a"), col("levels_b"),
        col("h_a_nats"), col("h_b_nats"), col("mi_nats"),
        when(col("h_a_nats") > 0.0 && col("h_b_nats") > 0.0,
          round(col("mi_nats") / sqrt(col("h_a_nats") * col("h_b_nats")), 6))
          .as("nmi"))
  }

  /** DuckDB mirror of [[mutualInformation]] over `tbl`: a complete
    * SELECT (not a CTE body). */
  def sqlMutualInformation(tbl: String, aSql: String, bSql: String): String = {
    def snapSum(term: String) =
      s"CAST(round(sum(CAST(round($term, 8) AS DECIMAL(14,8))), 6) AS DOUBLE)"
    val nD = "CAST(n AS DOUBLE)"
    s"""
    WITH cells AS (
      SELECT $aSql AS a, $bSql AS b, count(*) AS o
      FROM $tbl GROUP BY 1, 2),
    ma AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
    mb AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
    nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    mi AS (
      SELECT ${snapSum(s"(CAST(o AS DOUBLE) / $nD) * ln(CAST(o AS DOUBLE) * $nD" +
        " / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)))")} AS mi_nats
      FROM cells c
      JOIN ma m ON c.a IS NOT DISTINCT FROM m.a
      JOIN mb k ON c.b IS NOT DISTINCT FROM k.b
      CROSS JOIN nt),
    ha AS (
      SELECT count(*) AS levels_a,
        ${snapSum(s"-(CAST(ra AS DOUBLE) / $nD) * ln(CAST(ra AS DOUBLE) / $nD)")}
          AS h_a_nats
      FROM ma CROSS JOIN nt),
    hb AS (
      SELECT count(*) AS levels_b,
        ${snapSum(s"-(CAST(cb AS DOUBLE) / $nD) * ln(CAST(cb AS DOUBLE) / $nD)")}
          AS h_b_nats
      FROM mb CROSS JOIN nt)
    SELECT n, levels_a, levels_b, h_a_nats, h_b_nats, mi_nats,
      CASE WHEN h_a_nats > 0.0 AND h_b_nats > 0.0 THEN
        round(mi_nats / sqrt(h_a_nats * h_b_nats), 6)
      END AS nmi
    FROM nt CROSS JOIN ha CROSS JOIN hb CROSS JOIN mi"""
  }
}
