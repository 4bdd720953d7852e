package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-value sketches with set-operation
  * estimates (Bar-Yossef et al. '02; Beyer et al. '07 for the unioned
  * estimator) — the theta-sketch family member that answers "how many
  * distinct users did BOTH a and b see" without a pairwise exact-distinct
  * pass.
  *
  * [[Hll]] answers per-group distinct counts but cannot intersect; a KMV
  * sketch keeps the k smallest distinct portable-hash values of a set, and
  * because `kminset(A ∪ B) ⊆ kminset(A) ∪ kminset(B)`, sketches of two
  * sets suffice to estimate union AND intersection cardinalities:
  *  - θ = k-th smallest hash of the combined sketch; |A∪B| ≈ (k−1)·M/θ
  *    (M = 2^60, the hash range);
  *  - ρ = among those k smallest, how many appear in both sides' sketches;
  *    |A∩B| ≈ (ρ/k)·|A∪B|;
  *  - when the combined sketch holds FEWER than k values the sets are
  *    small enough that the sketch IS the union — both estimates switch
  *    to the exact counts.
  *
  * Determinism: hashes are the portable [[TextHash.md5Bits60]]; within a
  * set the distinct hashes are unique, so the rank window is total and the
  * only floating-point steps are the two final fixed-shape divisions
  * (snapped to 4 decimals) — which is what lets an *approximate* operator
  * hash-match a cross-engine oracle exactly.
  *
  * Scale shape: the sketch build is one distinct-style aggregation plus a
  * per-group top-k (rank window over ≤ #groups·k surviving rows after the
  * partial sort — Spark's WindowExec sorts within group only); everything
  * pairwise operates on sketches (≤ #groups·k rows), never raw data.
  */
object Kmv {

  /** Sketch size: k smallest hashes per set. Standard error ~1/√(k−2). */
  val K = 64

  /** Hash range as an exactly-representable double: 2^60. */
  val M: Double = 1152921504606846976.0

  /** Per-group KMV sketch of a key column: the k smallest distinct
    * portable hashes, one row per (group, h). NULL keys are dropped — a
    * NULL hashes to a NULL row, which Spark's rank window orders NULLS
    * FIRST but DuckDB's orders NULLS LAST, so keeping it would both waste
    * a sketch slot and diverge cross-engine. */
  def sketch(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val h = TextHash.md5Bits60(col(keyCol).cast("string"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    df.filter(col(keyCol).isNotNull)
      .select(col(groupCol), h.as("h")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K).drop("rn")
  }

  /** All-pairs union/intersection estimates from a sketch table (g, h):
    * one row per unordered group pair with (n_kept, theta, rho,
    * kmv_union_est, kmv_inter_est). Operates on the bounded sketch only. */
  def intersectEstimates(sk: DataFrame, groupCol: String): DataFrame = {
    val g = sk.select(col(groupCol).as("g")).distinct()
    val pairs = g.as("x").join(g.as("y"), col("x.g") < col("y.g"))
      .select(col("x.g").as("g_a"), col("y.g").as("g_b"))
    // each sketch row joins the pairs it participates in — two equi-joins
    // (left member, right member), not an OR-condition nested loop
    val s = sk.select(col(groupCol).as("g"), col("h"))
    val tagged = pairs.join(s, col("g") === col("g_a")).drop("g")
      .withColumn("in_a", lit(1)).withColumn("in_b", lit(0))
      .unionByName(pairs.join(s, col("g") === col("g_b")).drop("g")
        .withColumn("in_a", lit(0)).withColumn("in_b", lit(1)))
    val u = tagged.groupBy(col("g_a"), col("g_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("g_a"), col("g_b")).orderBy(col("h"))
    val kept = u.withColumn("rn", row_number().over(w)).filter(col("rn") <= K)
    val agg = kept.groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("theta"),
        sum(col("in_a") * col("in_b")).cast("long").as("rho"))
    // the union estimate appears unrounded inside the intersection
    // estimate — the SQL mirror repeats the same expression tree so both
    // engines evaluate identical IEEE operations
    val estU = when(col("n_kept") < K, col("n_kept").cast("double"))
      .otherwise(lit((K - 1).toDouble) * lit(M) / col("theta").cast("double"))
    agg
      .withColumn("kmv_union_est", round(estU, 4))
      .withColumn("kmv_inter_est",
        round(when(col("n_kept") < K, col("rho").cast("double"))
          .otherwise(col("rho").cast("double") * estU / lit(K.toDouble)), 4))
  }

  /** DuckDB mirror of [[sketch]] + [[intersectEstimates]] over
    * `FROM (srcSql) src` with columns (g, key). Emits CTE `kmv_est`
    * (g_a, g_b, n_kept, theta, rho, kmv_union_est, kmv_inter_est). */
  def sqlCtes(srcSql: String): String = {
    val h = TextHash.sqlMd5Bits60("CAST(key AS VARCHAR)")
    val estU = s"CASE WHEN count(*) < $K THEN CAST(count(*) AS DOUBLE) " +
      s"ELSE ${(K - 1).toDouble} * $M / CAST(max(h) AS DOUBLE) END"
    s"""kmv_h AS (
      SELECT DISTINCT g, $h AS h FROM ($srcSql) AS src
      WHERE key IS NOT NULL),
    kmv_sk AS (
      SELECT g, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        FROM kmv_h) WHERE rn <= $K),
    kmv_pairs AS (
      SELECT x.g AS g_a, y.g AS g_b
      FROM (SELECT DISTINCT g FROM kmv_sk) x
      JOIN (SELECT DISTINCT g FROM kmv_sk) y ON x.g < y.g),
    kmv_u AS (
      SELECT g_a, g_b, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        SELECT p.g_a, p.g_b, s.h, 1 AS in_a, 0 AS in_b
        FROM kmv_pairs p JOIN kmv_sk s ON s.g = p.g_a
        UNION ALL
        SELECT p.g_a, p.g_b, s.h, 0 AS in_a, 1 AS in_b
        FROM kmv_pairs p JOIN kmv_sk s ON s.g = p.g_b)
      GROUP BY 1, 2, 3),
    kmv_kept AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY g_a, g_b ORDER BY h) AS rn
        FROM kmv_u) WHERE rn <= $K),
    kmv_est AS (
      SELECT g_a, g_b, CAST(count(*) AS BIGINT) AS n_kept,
        max(h) AS theta, CAST(sum(in_a * in_b) AS BIGINT) AS rho,
        round($estU, 4) AS kmv_union_est,
        round(CASE WHEN count(*) < $K THEN CAST(sum(in_a * in_b) AS DOUBLE)
          ELSE CAST(sum(in_a * in_b) AS DOUBLE) * ($estU) / ${K.toDouble}
        END, 4) AS kmv_inter_est
      FROM kmv_kept GROUP BY 1, 2)"""
  }
}
