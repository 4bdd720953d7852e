package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Stable.dec

/** Per-segment Welch two-sample test — the A/B-comparison primitive
  * ("does metric X differ between arm A and arm B, within each segment")
  * computed from exact-decimal moments in ONE aggregation pass.
  *
  * Both samples' five moments (n, Σx, Σx²) accumulate as conditional
  * exact-decimal sums — combine-order-independent, so the statistic is
  * reproducible at any partitioning. Means, Welch-corrected variances and
  * the z statistic are fixed-shape double expressions over those exact
  * sums (identical operation-for-operation in the SQL mirror), snapped to
  * 6 decimals. Welch (unequal-variance) rather than pooled Student: the
  * arms of a real experiment rarely share a variance.
  *
  * Scale shape: one hash aggregation per segment — no second pass, no
  * window, map-side partials combine exactly.
  */
object Hypothesis {

  /** Per-group Welch test of `valueCol` between rows where `flagCol` is
    * true (arm A) and false (arm B). Output: (group…, n_a, n_b, mean_a,
    * mean_b, welch_z); z is NULL unless both arms have ≥ 2 rows and a
    * positive combined variance. NULL values/flags are excluded. */
  def welchTwoSample(df: DataFrame, groupCols: Seq[String], valueCol: String,
      flagCol: String): DataFrame = {
    val grp = groupCols.map(col)
    val x = dec(col(valueCol))
    val f = col(flagCol)
    def arm(cond: org.apache.spark.sql.Column, tag: String) = Seq(
      count(when(cond, lit(1))).as(s"n_$tag"),
      sum(when(cond, x)).cast("decimal(20,2)").as(s"sx_$tag"),
      sum(when(cond, x * x)).cast("decimal(30,4)").as(s"sxx_$tag"))
    val aggCols = arm(f, "a") ++ arm(!f, "b")
    val agg = df
      .filter(col(valueCol).isNotNull && f.isNotNull)
      .groupBy(grp: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    def nD(t: String) = col(s"n_$t").cast("double")
    def sxD(t: String) = col(s"sx_$t").cast("double")
    def sxxD(t: String) = col(s"sxx_$t").cast("double")
    def mean(t: String) = sxD(t) / nD(t)
    def variance(t: String) =
      (sxxD(t) - sxD(t) * sxD(t) / nD(t)) / (nD(t) - lit(1.0))
    val se2 = variance("a") / nD("a") + variance("b") / nD("b")
    agg
      .withColumn("mean_a", round(mean("a"), 6))
      .withColumn("mean_b", round(mean("b"), 6))
      .withColumn("welch_z",
        when(col("n_a") > 1 && col("n_b") > 1 && se2 > 0.0,
          round((mean("a") - mean("b")) / sqrt(se2), 6)))
      .select(grp ++ Seq(col("n_a"), col("n_b"), col("mean_a"),
        col("mean_b"), col("welch_z")): _*)
  }

  /** DuckDB mirror of [[welchTwoSample]] over `tbl`: emits CTE `welch_g`
    * (g, n_a, n_b, mean_a, mean_b, welch_z). `flagSql` must be a boolean
    * expression. Decimal casts declared width 19 for DuckDB's int128
    * multiply path (see Stable.sqlDsumsq). */
  def sqlWelchCtes(tbl: String, gSql: String, valSql: String,
      flagSql: String): String = {
    val x = s"CAST($valSql AS DECIMAL(19,2))"
    def n(c: String) = s"count(CASE WHEN $c THEN 1 END)"
    def sx(c: String) = s"CAST(sum(CASE WHEN $c THEN $x END) AS DECIMAL(20,2))"
    def sxx(c: String) =
      s"CAST(sum(CASE WHEN $c THEN $x * $x END) AS DECIMAL(30,4))"
    def meanE(t: String) = s"CAST(sx_$t AS DOUBLE) / CAST(n_$t AS DOUBLE)"
    def varE(t: String) =
      s"(CAST(sxx_$t AS DOUBLE) - CAST(sx_$t AS DOUBLE) * CAST(sx_$t AS DOUBLE)" +
        s" / CAST(n_$t AS DOUBLE)) / (CAST(n_$t AS DOUBLE) - 1.0)"
    val se2 = s"(${varE("a")}) / CAST(n_a AS DOUBLE) " +
      s"+ (${varE("b")}) / CAST(n_b AS DOUBLE)"
    s"""welch_m AS (
      SELECT $gSql AS g,
        ${n(s"($flagSql)")} AS n_a, ${sx(s"($flagSql)")} AS sx_a,
        ${sxx(s"($flagSql)")} AS sxx_a,
        ${n(s"NOT ($flagSql)")} AS n_b, ${sx(s"NOT ($flagSql)")} AS sx_b,
        ${sxx(s"NOT ($flagSql)")} AS sxx_b
      FROM $tbl
      WHERE ($valSql) IS NOT NULL AND ($flagSql) IS NOT NULL
      GROUP BY 1),
    welch_g AS (
      SELECT g, n_a, n_b,
        round(${meanE("a")}, 6) AS mean_a,
        round(${meanE("b")}, 6) AS mean_b,
        CASE WHEN n_a > 1 AND n_b > 1 AND ($se2) > 0.0 THEN
          round((${meanE("a")} - ${meanE("b")}) / sqrt($se2), 6)
        END AS welch_z
      FROM welch_m)"""
  }
}
