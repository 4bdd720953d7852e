package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quantile binning + weight-of-evidence (WOE) encoding — the classic
  * credit-scoring feature transform (the reference's domain: loan-approval
  * features; SURVEY §2.9's derived-feature family, taken to its standard
  * industrial form).
  *
  * For a numeric feature and a binary label: cut the feature at its
  * deciles, then score each bin by `WOE = ln((pos_i/pos_tot)/(neg_i/neg_tot))`
  * and the information-value contribution `IV_i = (pos_i/pos_tot −
  * neg_i/neg_tot) · WOE_i`. Monotone-binned WOE is what scorecard models
  * consume instead of the raw feature.
  *
  * Determinism: thresholds are exact type-7 interpolated percentiles (the
  * engine's established q19/q62 cross-engine parity); bin assignment is
  * `Σ 1[x > t_j]` over those thresholds — pure comparisons of identical
  * doubles, no float arithmetic to drift. Counts are integers; the WOE's
  * `ln` (the only libm call) is snapped to 8 decimals, and IV is built
  * from the snapped WOE.
  *
  * Scale shape: one percentile aggregation (swap in the GK sketch beyond
  * memory, as `Profiling.describeApprox` does), thresholds broadcast onto
  * the scan as a compiled comparison chain (nBins−1 literals — bounded
  * model metadata), then ONE hash aggregation keyed on bin. The feature
  * column never shuffles.
  */
object Binning {

  /** Exact decile-style thresholds: the (1/n … (n−1)/n) interior
    * percentiles of `valCol`. Returns nBins−1 doubles. */
  def quantileThresholds(df: DataFrame, valCol: String, nBins: Int): Array[Double] = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    df.select(expr(
        s"percentile($valCol, array(${ps.mkString(", ")}))").as("q"))
      .head().getSeq[Double](0).toArray
  }

  /** Bin index in [0, thresholds.length]: the number of thresholds
    * strictly below x. Boundary values (x == t_j) stay in the lower bin on
    * both engines — `>` compares the same IEEE doubles. */
  def binIndex(x: Column, thresholds: Array[Double]): Column =
    thresholds.map(t => when(x > lit(t), 1).otherwise(0))
      .reduce(_ + _).cast("long")

  /** Per-bin WOE/IV table: (bin, n, pos, neg, woe, iv). `labelCol` must be
    * 0/1. Bins where a class count is zero get NULL woe/iv (standard
    * practice is to merge such bins; at decile granularity over real data
    * they do not occur). */
  def woeTable(df: DataFrame, valCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    val th = quantileThresholds(df, valCol, nBins)
    val binned = df.select(binIndex(col(valCol), th).as("bin"),
      col(labelCol).cast("long").as("y"))
    val perBin = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    val tot = perBin.agg(sum(col("pos")).as("pos_tot"),
      sum(col("neg")).as("neg_tot"))
    val woeRaw = log(
      (col("pos").cast("double") / col("pos_tot")) /
        (col("neg").cast("double") / col("neg_tot")))
    val woe = when(col("pos") > 0L && col("neg") > 0L, round(woeRaw, 8))
    perBin.crossJoin(broadcast(tot))
      .withColumn("woe", woe)
      .withColumn("iv", round(
        (col("pos").cast("double") / col("pos_tot") -
          col("neg").cast("double") / col("neg_tot")) * col("woe"), 8))
      .select(col("bin"), col("n"), col("pos"), col("neg"), col("woe"), col("iv"))
  }

  /** DuckDB mirror of [[woeTable]] as CTE bodies over `tbl`: emits
    * `woe_bins` (bin, n, pos, neg, woe, iv). `labelSql` must evaluate to
    * 0/1. */
  def sqlWoeCtes(tbl: String, valSql: String, labelSql: String,
      nBins: Int = 10): String = {
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    val binExpr = (1 until nBins)
      .map(j => s"(CASE WHEN $valSql > q[$j] THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""woe_th AS (
      SELECT quantile_cont($valSql, [${ps.mkString(", ")}]) AS q FROM $tbl),
    woe_binned AS (
      SELECT CAST($binExpr AS BIGINT) AS bin, CAST($labelSql AS BIGINT) AS y
      FROM $tbl, woe_th),
    woe_per_bin AS (
      SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
        count(*) - CAST(sum(y) AS BIGINT) AS neg
      FROM woe_binned GROUP BY bin),
    woe_tot AS (
      SELECT CAST(sum(pos) AS BIGINT) AS pos_tot,
        CAST(sum(neg) AS BIGINT) AS neg_tot FROM woe_per_bin),
    woe_bins AS (
      SELECT bin, n, pos, neg,
        CASE WHEN pos > 0 AND neg > 0 THEN
          round(ln((CAST(pos AS DOUBLE) / pos_tot) /
                   (CAST(neg AS DOUBLE) / neg_tot)), 8) END AS woe,
        round((CAST(pos AS DOUBLE) / pos_tot -
               CAST(neg AS DOUBLE) / neg_tot) *
          (CASE WHEN pos > 0 AND neg > 0 THEN
            round(ln((CAST(pos AS DOUBLE) / pos_tot) /
                     (CAST(neg AS DOUBLE) / neg_tot)), 8) END), 8) AS iv
      FROM woe_per_bin, woe_tot)"""
  }
}
