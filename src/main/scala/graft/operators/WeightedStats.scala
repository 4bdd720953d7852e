package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted quantiles per group — the statistic `percentile` can't
  * express (every row counts equally there): the weighted φ-quantile is
  * the smallest value v whose cumulative weight reaches φ of the group
  * total. Weighted medians drive revenue-weighted "typical price",
  * token-weighted document length, and every duration-weighted SLA
  * metric.
  *
  * Distribution strategy (no one-partition-per-group window anywhere):
  *  1. collapse ties: per-(group, value) weight subtotals — a map-side
  *     combinable aggregation that also makes the crossing rule
  *     provably order-independent (a value qualifies iff the cumulative
  *     weight THROUGH it reaches the target — a pure function of the
  *     subtotals);
  *  2. bucket values by per-group exact quantile thresholds (bounded
  *     rows, broadcast back — [[PrefixSum]]'s trick, grouped);
  *  3. per-(group, bucket) totals → per-group exclusive offsets on the
  *     BOUNDED (groups × buckets) frame;
  *  4. only the single crossing bucket per group is scanned for the
  *     answer, under a window whose partitions are (group, bucket) —
  *     state bounded by one bucket's distinct values, never a group.
  *
  * Weights accumulate in exact decimal(18,2); the φ·total target is one
  * fixed-shape double product, so cross-engine comparison is exact.
  */
object WeightedStats {

  /** (group, wq, total_w, n_distinct): the weighted φ-quantile of
    * `valCol` under `weightCol` per `groupCol`. Weights must be
    * non-negative; values with zero total weight never win. */
  def weightedQuantile(df: DataFrame, groupCol: String, valCol: String,
      weightCol: String, phi: Double, nBuckets: Int = 32): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0, 1], got $phi")
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val g = col(groupCol)
    // 1. tie-collapsed subtotals
    val sub = df.select(g, col(valCol).cast("double").as("v"),
        col(weightCol).cast("decimal(18,2)").as("w"))
      .groupBy(g, col("v"))
      .agg(sum(col("w")).cast("decimal(20,2)").as("wv"))
    // 2. per-group thresholds (bounded: groups x (nBuckets-1)), broadcast;
    //    bucket = count of thresholds strictly below v (PrefixSum's
    //    boundary convention: ties stay low, the in-bucket scan refines)
    val ps = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val th = df.groupBy(g).agg(expr(
      s"percentile(`$valCol`, array(${ps.mkString(", ")}))").as("__th"))
    // persisted: four consumers below (bucket totals twice via offsets/
    // totals, the crossing-bucket scan, n_distinct) would otherwise each
    // recompute the subtotal aggregation + threshold join from the scan.
    // Freed by the callers' persistent-RDD sweep (Verify/Bench),
    // Components' contract. Isolated timing (tools/ProfileWq, sf0.1
    // lineitem): 3.2 s at 1x, 8.5 s at 4x rows — sublinear in input.
    val bucketed = sub.join(broadcast(th), groupCol)
      .withColumn("__b", size(filter(col("__th"),
        t => col("v") > t)).cast("long"))
      .drop("__th")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 3. bounded per-(group, bucket) totals and per-group offsets/targets
    val btot = bucketed.groupBy(g, col("__b"))
      .agg(sum(col("wv")).cast("decimal(20,2)").as("__bw"))
    val wOff = Window.partitionBy(g).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = btot
      .withColumn("__off", coalesce(sum(col("__bw")).over(wOff),
        lit(0).cast("decimal(20,2)")))
    val totals = btot.groupBy(g)
      .agg(sum(col("__bw")).cast("decimal(20,2)").as("total_w"))
      .withColumn("__target",
        col("total_w").cast("double") * lit(phi))
    // the crossing bucket: smallest b whose inclusive running weight
    // reaches the target (computed on the bounded offsets frame)
    val crossing = offsets.join(totals, groupCol)
      .filter((col("__off") + col("__bw")).cast("double") >= col("__target"))
      .groupBy(g).agg(min(col("__b")).as("__b"))
      .join(offsets, Seq(groupCol, "__b"))
      .join(totals, groupCol)
      .select(g, col("__b"), col("__off"), col("total_w"), col("__target"))
    // 4. scan ONLY the crossing bucket: per-(group, bucket) running
    //    weight over tie-collapsed values; the answer is the smallest v
    //    whose through-weight reaches the target
    val wIn = Window.partitionBy(g, col("__b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nDistinct = bucketed.groupBy(g).agg(count(lit(1)).as("n_distinct"))
    bucketed.join(broadcast(crossing), Seq(groupCol, "__b"))
      .withColumn("__cum",
        (col("__off") + sum(col("wv")).over(wIn)).cast("double"))
      .filter(col("__cum") >= col("__target"))
      .groupBy(g, col("total_w"))
      .agg(min(col("v")).as("wq"))
      .join(nDistinct, groupCol)
      .select(g, col("wq"), col("total_w").cast("double").as("total_w"),
        col("n_distinct"))
  }

  /** DuckDB mirror of [[weightedQuantile]] as CTE bodies over `srcSql`
    * (columns g, v, w): emits `wq_sel` (g, wq, total_w, n_distinct). The
    * mirror is the DIRECT formulation (global per-group cumsum) — the
    * crossing rule is order-independent on tie-collapsed subtotals, so
    * bucketed and direct agree exactly. */
  def sqlWeightedQuantileCtes(srcSql: String, phi: Double): String = s"""
    wq_sub AS (
      SELECT g, v, CAST(sum(CAST(w AS DECIMAL(18,2))) AS DECIMAL(20,2)) AS wv
      FROM ($srcSql) AS src GROUP BY g, v),
    wq_tot AS (
      SELECT g, CAST(sum(wv) AS DECIMAL(20,2)) AS total_w,
        count(*) AS n_distinct
      FROM wq_sub GROUP BY g),
    wq_cum AS (
      SELECT g, v,
        sum(wv) OVER (PARTITION BY g ORDER BY v
          ROWS UNBOUNDED PRECEDING) AS cum
      FROM wq_sub),
    wq_sel AS (
      SELECT c.g, min(c.v) AS wq,
        CAST(t.total_w AS DOUBLE) AS total_w, t.n_distinct
      FROM wq_cum c JOIN wq_tot t USING (g)
      WHERE CAST(c.cum AS DOUBLE) >= CAST(t.total_w AS DOUBLE) * $phi
      GROUP BY c.g, t.total_w, t.n_distinct)"""
}
