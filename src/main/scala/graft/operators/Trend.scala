package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Stable.dec

/** Grouped closed-form linear regression (per-segment trend lines) —
  * `regr_slope`/`regr_intercept` semantics, rebuilt on exact-decimal
  * moments so the result is combine-order-independent and therefore
  * reproducible at any partitioning (both engines' built-in `regr_*`
  * aggregate in floats, which is unreproducible by construction at 100 TB
  * — the same reason `Stable` exists).
  *
  * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, `intercept = (Σy −
  * slope·Σx)/n`. All five moments accumulate exactly: x is an integer
  * regressor (day number, epoch week, position), y is snapped to 2
  * decimals; products stay well inside decimal(38). The ONLY floating
  * ops are the two final divisions and one multiply, performed on the
  * same exact-decimal-derived doubles in both engines → bit-equal, then
  * snapped (slope 8 decimals, intercept 6) out of caution.
  *
  * Scale shape: one hash aggregation per group computing five sums — the
  * cheapest possible plan; no window, no second pass, map-side partials
  * combine exactly (decimal addition is associative).
  *
  * Bounds (loud under ANSI casts, not silent): |x| < 10^7 and |y| < 10^10
  * keep every intermediate inside both engines' 38-digit cliff with n up
  * to ~10^11 rows per group (the post-aggregation casts throw on
  * overflow rather than truncate).
  */
object Trend {

  /** Per-group OLS fit of `yCol` on integer regressor `xCol`.
    * Output: (group…, n, slope, intercept). Groups with zero x-variance
    * (or a single point) yield NULL slope/intercept. Rows with a NULL in
    * either coordinate are excluded (pairwise-complete, same as
    * [[fitContinuousXY]]/[[groupedPearson]]) — without the filter `n`
    * counts rows the moment sums skip, silently skewing the fit. */
  def groupedLinearFit(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val grp = groupCols.map(col)
    val x = col(xCol).cast("decimal(7,0)")
    val y = dec(col(yCol))
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(grp :+ x.as("x") :+ y.as("y"): _*)
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(18,0)").as("sx"),
        sum(col("x") * col("x")).cast("decimal(25,0)").as("sxx"),
        sum(col("y")).cast("decimal(16,2)").as("sy"),
        sum(col("x") * col("y")).cast("decimal(23,2)").as("sxy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val den = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    // floor-snap, not round(): slope/intercept are raw double quotients,
    // and round() on a double diverges between engines on half-boundary
    // renderings (Spark rounds the shortest decimal repr, DuckDB the
    // binary value — q230 flipped an intercept at the r10 sf1 sweep's
    // 10x magnitudes). floor(x·10^k + 0.5) is the same IEEE sequence in
    // both engines (half-toward-+inf for negatives, consistently).
    val slope = when(den =!= 0.0, floor(num / den * 1e8 + 0.5) / 1e8)
    agg
      .withColumn("slope", slope)
      .withColumn("intercept", floor(
        (col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / nD * 1e6 + 0.5) / 1e6)
      .select(grp :+ col("n") :+ col("slope") :+ col("intercept"): _*)
  }

  /** Per-group OLS fit AND correlation for CONTINUOUS regressors (log-log
    * power-law fits, scatter trends) — [[groupedLinearFit]] requires an
    * integer x; here both coordinates are snapped to 8 exact decimals
    * (|x|,|y| < 10^6) and the six moments accumulate exactly in decimal,
    * so slope/intercept/r are combine-order-independent. Floats appear
    * only in the final fixed-shape expressions (slope/r snapped to 8
    * decimals, intercept 6). */
  def fitContinuousXY(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val grp = groupCols.map(col)
    val x = round(col(xCol), 8).cast("decimal(14,8)")
    val y = round(col(yCol), 8).cast("decimal(14,8)")
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(grp :+ x.as("x") :+ y.as("y"): _*)
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(24,8)").as("sx"),
        sum(col("y")).cast("decimal(24,8)").as("sy"),
        sum(col("x") * col("x")).cast("decimal(38,16)").as("sxx"),
        sum(col("y") * col("y")).cast("decimal(38,16)").as("syy"),
        sum(col("x") * col("y")).cast("decimal(38,16)").as("sxy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    agg
      .withColumn("slope", when(vx =!= 0.0, round(cov / vx, 8)))
      .withColumn("intercept", round(
        (col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / nD, 6))
      .withColumn("r",
        when(vx > 0.0 && vy > 0.0, round(cov / (sqrt(vx) * sqrt(vy)), 8)))
      .select(grp ++ Seq(col("n"), col("slope"), col("intercept"),
        col("r")): _*)
  }

  /** DuckDB mirror of [[fitContinuousXY]] over `tbl`: emits CTE `fit_g`
    * (g, n, slope, intercept, r). Width-19 casts force DuckDB's int128
    * multiply — re-pinned empirically in r9: DuckDB multiplies two
    * width-<=18 decimals in their int64 storage regardless of the result
    * width, so the old width-15 operands sat one order of magnitude from
    * the overflow cliff (unscaled ln-value products reach ~2e18 vs
    * int64's 9.2e18). See Stable.sqlDsumsq and oracle_lint rule 5. */
  def sqlFitContinuousCtes(tbl: String, gSql: String, xSql: String,
      ySql: String): String = {
    val x = s"CAST(round($xSql, 8) AS DECIMAL(19,8))"
    val y = s"CAST(round($ySql, 8) AS DECIMAL(19,8))"
    val cov = "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    val vx = "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    val vy = "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) " +
      "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    val slope = s"CASE WHEN ($vx) <> 0.0 THEN round(($cov) / ($vx), 8) END"
    s"""fit_m AS (
      SELECT $gSql AS g, count(*) AS n,
        CAST(sum($x) AS DECIMAL(24,8)) AS sx,
        CAST(sum($y) AS DECIMAL(24,8)) AS sy,
        CAST(sum($x * $x) AS DECIMAL(38,16)) AS sxx,
        CAST(sum($y * $y) AS DECIMAL(38,16)) AS syy,
        CAST(sum($x * $y) AS DECIMAL(38,16)) AS sxy
      FROM $tbl
      WHERE ($xSql) IS NOT NULL AND ($ySql) IS NOT NULL
      GROUP BY 1),
    fit_g AS (
      SELECT g, n,
        $slope AS slope,
        round((CAST(sy AS DOUBLE) - ($slope) * CAST(sx AS DOUBLE))
          / CAST(n AS DOUBLE), 6) AS intercept,
        CASE WHEN ($vx) > 0.0 AND ($vy) > 0.0 THEN
          round(($cov) / (sqrt($vx) * sqrt($vy)), 8)
        END AS r
      FROM fit_m)"""
  }

  /** Per-group TWO-regressor OLS — `y ~ b0 + b1·x1 + b2·x2` solved in
    * closed form from the 2×2 normal equations on exact-decimal moments
    * (the multiple-regression step up from [[fitContinuousXY]]; same
    * scale shape: ONE hash aggregation computing nine exact sums, no
    * second pass, map-side partials combine exactly).
    *
    * With centered second moments S_ab = n·Σab − Σa·Σb:
    *   det = S11·S22 − S12²,
    *   b1 = (S1y·S22 − S2y·S12)/det,  b2 = (S2y·S11 − S1y·S12)/det,
    *   b0 = (Σy − b1·Σx1 − b2·Σx2)/n,
    *   R² = (b1·S1y + b2·S2y)/Syy.
    * All moments exact decimal (coordinates snapped to 8 decimals,
    * |v| < 10^6 — the fitContinuousXY bound); floats only in the final
    * fixed-shape expressions, so the fit is combine-order-independent
    * and hash-checkable. Collinear regressors (det = 0) or a constant y
    * yield NULL coefficients / NULL R² rather than garbage. R² uses the
    * ROUNDED b1/b2 (8 decimals) — the oracle repeats the identical
    * rounded expressions, keeping the quotient bit-equal. */
  def groupedOls2(df: DataFrame, groupCols: Seq[String], x1Col: String,
      x2Col: String, yCol: String): DataFrame = {
    val grp = groupCols.map(col)
    def snap(c: String) = round(col(c), 8).cast("decimal(14,8)")
    val agg = df
      .filter(col(x1Col).isNotNull && col(x2Col).isNotNull &&
        col(yCol).isNotNull)
      .select(grp :+ snap(x1Col).as("x1") :+ snap(x2Col).as("x2")
        :+ snap(yCol).as("y"): _*)
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).cast("decimal(24,8)").as("s1"),
        sum(col("x2")).cast("decimal(24,8)").as("s2"),
        sum(col("y")).cast("decimal(24,8)").as("sy"),
        sum(col("x1") * col("x1")).cast("decimal(38,16)").as("s11"),
        sum(col("x2") * col("x2")).cast("decimal(38,16)").as("s22"),
        sum(col("x1") * col("x2")).cast("decimal(38,16)").as("s12"),
        sum(col("x1") * col("y")).cast("decimal(38,16)").as("s1y"),
        sum(col("x2") * col("y")).cast("decimal(38,16)").as("s2y"),
        sum(col("y") * col("y")).cast("decimal(38,16)").as("syy"))
    val nD = col("n").cast("double")
    def ctr(sab: String, sa: String, sb: String): Column =
      nD * col(sab).cast("double") -
        col(sa).cast("double") * col(sb).cast("double")
    val c11 = ctr("s11", "s1", "s1"); val c22 = ctr("s22", "s2", "s2")
    val c12 = ctr("s12", "s1", "s2"); val c1y = ctr("s1y", "s1", "sy")
    val c2y = ctr("s2y", "s2", "sy"); val cyy = ctr("syy", "sy", "sy")
    val det = c11 * c22 - c12 * c12
    agg
      .withColumn("b1", when(det =!= 0.0,
        round((c1y * c22 - c2y * c12) / det, 8)))
      .withColumn("b2", when(det =!= 0.0,
        round((c2y * c11 - c1y * c12) / det, 8)))
      .withColumn("b0", round(
        (col("sy").cast("double") - col("b1") * col("s1").cast("double")
          - col("b2") * col("s2").cast("double")) / nD, 6))
      .withColumn("r2", when(det =!= 0.0 && cyy > 0.0,
        round((col("b1") * c1y + col("b2") * c2y) / cyy, 8)))
      .select(grp ++ Seq(col("n"), col("b0"), col("b1"), col("b2"),
        col("r2")): _*)
  }

  /** DuckDB mirror of [[groupedOls2]] over `tbl`: emits CTE `ols2_g`
    * (g, n, b0, b1, b2, r2). Input casts are width-20, NOT 15: DuckDB
    * types a (15,8)×(15,8) product as DECIMAL(18,16) and multiplies the
    * scaled int64s raw — any |v·w| ≥ 100 overflows (observed on
    * quantity², sf0.01). Width > 18 on the operands forces the int128
    * path, whose product width caps at 38 and holds |v| < 10^6 exactly
    * (the operator's documented bound). */
  def sqlOls2Ctes(tbl: String, gSql: String, x1Sql: String, x2Sql: String,
      ySql: String): String = {
    def snap(e: String) = s"CAST(round($e, 8) AS DECIMAL(20,8))"
    val (x1, x2, y) = (snap(x1Sql), snap(x2Sql), snap(ySql))
    def ctr(sab: String, sa: String, sb: String) =
      s"(CAST(n AS DOUBLE) * CAST($sab AS DOUBLE) " +
        s"- CAST($sa AS DOUBLE) * CAST($sb AS DOUBLE))"
    val c11 = ctr("s11", "s1", "s1"); val c22 = ctr("s22", "s2", "s2")
    val c12 = ctr("s12", "s1", "s2"); val c1y = ctr("s1y", "s1", "sy")
    val c2y = ctr("s2y", "s2", "sy"); val cyy = ctr("syy", "sy", "sy")
    val det = s"($c11 * $c22 - $c12 * $c12)"
    val b1 = s"CASE WHEN $det <> 0.0 THEN " +
      s"round(($c1y * $c22 - $c2y * $c12) / $det, 8) END"
    val b2 = s"CASE WHEN $det <> 0.0 THEN " +
      s"round(($c2y * $c11 - $c1y * $c12) / $det, 8) END"
    s"""ols2_m AS (
      SELECT $gSql AS g, count(*) AS n,
        CAST(sum($x1) AS DECIMAL(24,8)) AS s1,
        CAST(sum($x2) AS DECIMAL(24,8)) AS s2,
        CAST(sum($y) AS DECIMAL(24,8)) AS sy,
        CAST(sum($x1 * $x1) AS DECIMAL(38,16)) AS s11,
        CAST(sum($x2 * $x2) AS DECIMAL(38,16)) AS s22,
        CAST(sum($x1 * $x2) AS DECIMAL(38,16)) AS s12,
        CAST(sum($x1 * $y) AS DECIMAL(38,16)) AS s1y,
        CAST(sum($x2 * $y) AS DECIMAL(38,16)) AS s2y,
        CAST(sum($y * $y) AS DECIMAL(38,16)) AS syy
      FROM $tbl
      WHERE ($x1Sql) IS NOT NULL AND ($x2Sql) IS NOT NULL
        AND ($ySql) IS NOT NULL
      GROUP BY 1),
    ols2_g AS (
      SELECT g, n,
        round((CAST(sy AS DOUBLE) - ($b1) * CAST(s1 AS DOUBLE)
          - ($b2) * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS b0,
        $b1 AS b1,
        $b2 AS b2,
        CASE WHEN $det <> 0.0 AND $cyy > 0.0 THEN
          round((($b1) * $c1y + ($b2) * $c2y) / $cyy, 8) END AS r2
      FROM ols2_m)"""
  }

  /** Per-group Pearson correlation between two measure columns, on the
    * same exact-decimal moment machinery as [[groupedLinearFit]] (both
    * measures snapped to 2 decimals; five exact sums; floats only in the
    * final covariance/variance expression, snapped to 8 decimals). Rows
    * with a NULL in either column are excluded (pairwise-complete
    * semantics, matching `corr`); zero variance on either side yields a
    * NULL r. */
  def groupedPearson(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val grp = groupCols.map(col)
    val x = dec(col(xCol))
    val y = dec(col(yCol))
    val agg = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(grp :+ x.as("x") :+ y.as("y"): _*)
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(20,2)").as("sx"),
        sum(col("y")).cast("decimal(20,2)").as("sy"),
        sum(col("x") * col("x")).cast("decimal(30,4)").as("sxx"),
        sum(col("y") * col("y")).cast("decimal(30,4)").as("syy"),
        sum(col("x") * col("y")).cast("decimal(30,4)").as("sxy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    agg
      .withColumn("r",
        when(vx > 0.0 && vy > 0.0, round(cov / (sqrt(vx) * sqrt(vy)), 8)))
      .select(grp :+ col("n") :+ col("r"): _*)
  }

  /** DuckDB mirror of [[groupedPearson]] over `tbl`: emits CTE `corr_g`
    * (g, n, r). Decimal casts are declared width 19 so DuckDB multiplies
    * in int128 (see Stable.sqlDsumsq for the width cliff). */
  def sqlPearsonCtes(tbl: String, gSql: String, xSql: String,
      ySql: String): String = {
    val x = s"CAST($xSql AS DECIMAL(19,2))"
    val y = s"CAST($ySql AS DECIMAL(19,2))"
    val cov = "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    val vx = "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
    val vy = "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) " +
      "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
    s"""corr_m AS (
      SELECT $gSql AS g, count(*) AS n,
        CAST(sum($x) AS DECIMAL(20,2)) AS sx,
        CAST(sum($y) AS DECIMAL(20,2)) AS sy,
        CAST(sum($x * $x) AS DECIMAL(30,4)) AS sxx,
        CAST(sum($y * $y) AS DECIMAL(30,4)) AS syy,
        CAST(sum($x * $y) AS DECIMAL(30,4)) AS sxy
      FROM $tbl
      WHERE ($xSql) IS NOT NULL AND ($ySql) IS NOT NULL
      GROUP BY 1),
    corr_g AS (
      SELECT g, n,
        CASE WHEN ($vx) > 0.0 AND ($vy) > 0.0 THEN
          round(($cov) / (sqrt($vx) * sqrt($vy)), 8)
        END AS r
      FROM corr_m)"""
  }

  /** Pairwise Pearson correlation MATRIX over `cols` in ONE aggregation
    * pass: all k sums, k sums-of-squares and k(k−1)/2 cross-products
    * accumulate as exact decimals in a single hash agg (listwise-complete
    * rows — a row with any NULL is dropped so every pair shares one n),
    * then the one-row moment frame explodes into (col_a, col_b, n, r)
    * pair rows driver-side-free. The EDA panel behind feature pruning —
    * and the input to PCA's covariance step — without k² scans: at 100 TB
    * the data is read ONCE regardless of k. Same moment/float discipline
    * as [[groupedPearson]]; zero variance on either side yields NULL r. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def d(c: String) = dec(col(c))
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(d(c)).cast("decimal(20,2)").as(s"s_$c")) ++
      cols.map(c => sum(d(c) * d(c)).cast("decimal(30,4)").as(s"q_$c")) ++
      pairs.map { case (a, b) =>
        sum(d(a) * d(b)).cast("decimal(30,4)").as(s"p_${a}__$b") }
    val m = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    def sD(c: String) = col(s"s_$c").cast("double")
    def qD(c: String) = col(s"q_$c").cast("double")
    val pairStructs = pairs.map { case (a, b) =>
      val cov = nD * col(s"p_${a}__$b").cast("double") - sD(a) * sD(b)
      val vx = nD * qD(a) - sD(a) * sD(a)
      val vy = nD * qD(b) - sD(b) * sD(b)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(vx > 0.0 && vy > 0.0,
          round(cov / (sqrt(vx) * sqrt(vy)), 8)).as("r"))
    }
    m.select(col("n"), explode(array(pairStructs: _*)).as("pr"))
      .select(col("pr.col_a").as("col_a"), col("pr.col_b").as("col_b"),
        col("n"), col("pr.r").as("r"))
  }

  /** DuckDB mirror of [[correlationMatrix]] over `tbl`: emits CTEs
    * ending in `cm` (col_a, col_b, n, r) — one moment CTE, one UNION ALL
    * branch per pair (DuckDB evaluates the one-row CTE once). */
  def sqlCorrMatrixCtes(tbl: String, cols: Seq[String]): String = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def x(c: String) = s"CAST($c AS DECIMAL(19,2))"
    val sums = cols.map(c => s"CAST(sum(${x(c)}) AS DECIMAL(20,2)) AS s_$c") ++
      cols.map(c => s"CAST(sum(${x(c)} * ${x(c)}) AS DECIMAL(30,4)) AS q_$c") ++
      pairs.map { case (a, b) =>
        s"CAST(sum(${x(a)} * ${x(b)}) AS DECIMAL(30,4)) AS p_${a}__$b" }
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val branches = pairs.map { case (a, b) =>
      val cov = s"CAST(n AS DOUBLE) * CAST(p_${a}__$b AS DOUBLE) " +
        s"- CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE)"
      val vx = s"CAST(n AS DOUBLE) * CAST(q_$a AS DOUBLE) " +
        s"- CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE)"
      val vy = s"CAST(n AS DOUBLE) * CAST(q_$b AS DOUBLE) " +
        s"- CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)"
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
        CASE WHEN ($vx) > 0.0 AND ($vy) > 0.0 THEN
          round(($cov) / (sqrt($vx) * sqrt($vy)), 8)
        END AS r
      FROM cm_m"""
    }
    s"""cm_m AS (
      SELECT count(*) AS n,
        ${sums.mkString(",\n        ")}
      FROM $tbl
      WHERE $notNull),
    cm AS (
      ${branches.mkString("\n      UNION ALL\n      ")})"""
  }

  /** Holt double exponential smoothing (level + linear trend) per
    * series — the forecasting step up from a bare EMA (q138): a series
    * with drift needs the trend term or the smoothed level lags forever.
    * l₁ = y₁, b₁ = 0; then lₜ = α·yₜ + (1−α)(lₜ₋₁+bₜ₋₁),
    * bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁, observation-indexed (calendar gaps
    * are not imputed — both engines walk the same observed sequence).
    *
    * The recursion is inherently sequential, so it runs INSIDE each
    * series: collect_list → sort_array → `aggregate` higher-order fold
    * — per-series state is bounded by series length (a calendar axis,
    * not data volume), series parallelize freely, and the fold's
    * fixed-shape double steps are IEEE-identical to the DuckDB
    * recursive CTE walking rows in the same order ([[sqlHoltCtes]]).
    *
    * Output per series: n_obs, level, trend, forecast_h (= l + h·b),
    * each rounded at 6. */
  def holtLinear(df: DataFrame, groupCols: Seq[String], orderCol: String,
      yCol: String, alpha: Double, beta: Double, horizon: Int): DataFrame = {
    val grp = groupCols.map(col)
    val fold =
      s"""aggregate(
        sort_array(collect_list(struct($orderCol AS o, CAST($yCol AS DOUBLE) AS y))),
        named_struct('l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE),
          'i', CAST(0 AS BIGINT)),
        (acc, x) -> CASE WHEN acc.i = 0
          THEN named_struct('l', x.y, 'b', CAST(0 AS DOUBLE),
            'i', CAST(1 AS BIGINT))
          ELSE named_struct(
            'l', CAST($alpha AS DOUBLE) * x.y
              + CAST(${1 - alpha} AS DOUBLE) * (acc.l + acc.b),
            'b', CAST($beta AS DOUBLE)
              * ((CAST($alpha AS DOUBLE) * x.y
                  + CAST(${1 - alpha} AS DOUBLE) * (acc.l + acc.b)) - acc.l)
              + CAST(${1 - beta} AS DOUBLE) * acc.b,
            'i', acc.i + 1) END)"""
    df.groupBy(grp: _*)
      .agg(count(lit(1)).as("n_obs"), expr(fold).as("acc"))
      .select(grp ++ Seq(col("n_obs"),
        round(col("acc.l"), 6).as("level"),
        round(col("acc.b"), 6).as("trend"),
        round(col("acc.l") + lit(horizon.toDouble) * col("acc.b"), 6)
          .as(s"forecast_$horizon")): _*)
  }

  /** DuckDB mirror of [[holtLinear]]: emits CTEs (prepend `WITH
    * RECURSIVE `) ending in `holt_g` (g, n_obs, level, trend,
    * forecast_h). `src` must expose columns g, o (order), y. The
    * recursive CTE adds one row per series per step — the same
    * observation walk as the Spark fold, with the same expression
    * shapes. */
  def sqlHoltCtes(src: String, alpha: Double, beta: Double,
      horizon: Int): String = {
    val a = s"CAST($alpha AS DOUBLE)"
    val ia = s"CAST(${1 - alpha} AS DOUBLE)"
    val b = s"CAST($beta AS DOUBLE)"
    val ib = s"CAST(${1 - beta} AS DOUBLE)"
    val lNext = s"$a * CAST(o.y AS DOUBLE) + $ia * (r.l + r.b)"
    s"""holt_o AS MATERIALIZED (
      SELECT g, CAST(y AS DOUBLE) AS y,
        row_number() OVER (PARTITION BY g ORDER BY o) AS rn
      FROM $src),
    holt_rec AS (
      SELECT g, rn, y AS l, CAST(0 AS DOUBLE) AS b
      FROM holt_o WHERE rn = 1
      UNION ALL
      SELECT o.g, o.rn,
        $lNext,
        $b * (($lNext) - r.l) + $ib * r.b
      FROM holt_rec r JOIN holt_o o ON o.g = r.g AND o.rn = r.rn + 1),
    holt_last AS (
      SELECT g, max(rn) AS n_obs FROM holt_o GROUP BY 1),
    holt_g AS (
      SELECT r.g, hl.n_obs,
        round(r.l, 6) AS level,
        round(r.b, 6) AS trend,
        round(r.l + CAST($horizon AS DOUBLE) * r.b, 6) AS forecast_$horizon
      FROM holt_rec r JOIN holt_last hl ON hl.g = r.g AND r.rn = hl.n_obs)"""
  }

  /** First principal component of the CORRELATION matrix of `cols` by
    * fixed-iteration power method — PCA at 100 TB the Spark-native way:
    * ONE scan builds the exact-decimal moment row (the
    * [[correlationMatrix]] aggregation), and the iteration is pure
    * scalar double arithmetic on that one-row frame (v ← Rv/‖Rv‖),
    * IEEE-identical in any engine because no data-sized float reduction
    * remains. Each iteration is cut at a localCheckpoint so the scalar
    * expression tree cannot snowball through CollapseProject.
    *
    * Output: one row per feature — (feature, loading, eigenvalue,
    * explained_ratio, n); eigenvalue is the final ‖Rv‖ (→ λ₁),
    * explained_ratio = λ₁/k (correlation matrix has trace k). Degenerate
    * inputs (a zero-variance column) surface as NULLs, not a silent
    * answer. Convergence is geometric in λ₁/λ₂ — 12 iterations is ample
    * for EDA panels; raise it for near-degenerate spectra. */
  def pcaFirstComponent(df: DataFrame, cols: Seq[String],
      iters: Int = 12): DataFrame = {
    val k = cols.size
    require(k >= 2, "pcaFirstComponent needs at least two columns")
    require(iters >= 1 && iters <= 30, s"iters must be in [1,30], got $iters")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (i, j)
    def d(c: String) = dec(col(c))
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.zipWithIndex.map { case (c, i) =>
        sum(d(c)).cast("decimal(20,2)").as(s"s_$i") } ++
      cols.zipWithIndex.map { case (c, i) =>
        sum(d(c) * d(c)).cast("decimal(30,4)").as(s"q_$i") } ++
      pairs.map { case (i, j) =>
        sum(d(cols(i)) * d(cols(j))).cast("decimal(30,4)").as(s"p_${i}_$j") }
    var m = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    def sD(i: Int) = col(s"s_$i").cast("double")
    def qD(i: Int) = col(s"q_$i").cast("double")
    pairs.foreach { case (i, j) =>
      val cov = nD * col(s"p_${i}_$j").cast("double") - sD(i) * sD(j)
      val vx = nD * qD(i) - sD(i) * sD(i)
      val vy = nD * qD(j) - sD(j) * sD(j)
      m = m.withColumn(s"r_${i}_$j",
        when(vx > 0.0 && vy > 0.0, round(cov / (sqrt(vx) * sqrt(vy)), 8)))
    }
    def R(i: Int, j: Int): Column =
      if (i == j) lit(1.0)
      else if (i < j) col(s"r_${i}_$j")
      else col(s"r_${j}_$i")
    val v0 = 1.0 / math.sqrt(k.toDouble)
    cols.indices.foreach { i => m = m.withColumn(s"v_$i", lit(v0)) }
    m = m.localCheckpoint(true)
    var t = 0
    while (t < iters) {
      cols.indices.foreach { i =>
        m = m.withColumn(s"u_$i",
          cols.indices.map(j => R(i, j) * col(s"v_$j")).reduce(_ + _))
      }
      m = m.withColumn("nrm", sqrt(
        cols.indices.map(i => col(s"u_$i") * col(s"u_$i")).reduce(_ + _)))
      cols.indices.foreach { i =>
        m = m.withColumn(s"v_$i", col(s"u_$i") / col("nrm"))
      }
      // one-row frame: the checkpoint is O(1) data, and it stops the
      // scalar tree tripling per round under projection collapse
      m = m.localCheckpoint(true)
      t += 1
    }
    val loadings = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("feature"), round(col(s"v_$i"), 6).as("loading"))
    }
    m.select(col("n"), round(col("nrm"), 6).as("eigenvalue"),
        round(col("nrm") / lit(k.toDouble), 6).as("explained_ratio"),
        explode(array(loadings: _*)).as("pc"))
      .select(col("pc.feature").as("feature"), col("pc.loading").as("loading"),
        col("eigenvalue"), col("explained_ratio"), col("n"))
  }

  /** DuckDB mirror of [[pcaFirstComponent]] over `tbl`: emits CTEs
    * ending in `pca` (feature, loading, eigenvalue, explained_ratio, n).
    * One materialized CTE per iteration walks the same scalar recurrence
    * with the same expression shapes. */
  def sqlPcaCtes(tbl: String, cols: Seq[String], iters: Int = 12): String = {
    val k = cols.size
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (i, j)
    def x(c: String) = s"CAST($c AS DECIMAL(19,2))"
    val sums = cols.zipWithIndex.map { case (c, i) =>
      s"CAST(sum(${x(c)}) AS DECIMAL(20,2)) AS s_$i" } ++
      cols.zipWithIndex.map { case (c, i) =>
        s"CAST(sum(${x(c)} * ${x(c)}) AS DECIMAL(30,4)) AS q_$i" } ++
      pairs.map { case (i, j) =>
        s"CAST(sum(${x(cols(i))} * ${x(cols(j))}) AS DECIMAL(30,4)) AS p_${i}_$j" }
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val rCols = pairs.map { case (i, j) =>
      val cov = s"CAST(n AS DOUBLE) * CAST(p_${i}_$j AS DOUBLE) " +
        s"- CAST(s_$i AS DOUBLE) * CAST(s_$j AS DOUBLE)"
      val vx = s"CAST(n AS DOUBLE) * CAST(q_$i AS DOUBLE) " +
        s"- CAST(s_$i AS DOUBLE) * CAST(s_$i AS DOUBLE)"
      val vy = s"CAST(n AS DOUBLE) * CAST(q_$j AS DOUBLE) " +
        s"- CAST(s_$j AS DOUBLE) * CAST(s_$j AS DOUBLE)"
      s"""CASE WHEN ($vx) > 0.0 AND ($vy) > 0.0 THEN
        round(($cov) / (sqrt($vx) * sqrt($vy)), 8) END AS r_${i}_$j"""
    }
    def rRef(i: Int, j: Int): String =
      if (i == j) "CAST(1.0 AS DOUBLE)"
      else if (i < j) s"r_${i}_$j" else s"r_${j}_$i"
    val v0 = 1.0 / math.sqrt(k.toDouble)
    val rPass = pairs.map { case (i, j) => s"r_${i}_$j" }.mkString(", ")
    val sb = new StringBuilder
    sb.append(s"""pca_m AS (
      SELECT count(*) AS n,
        ${sums.mkString(",\n        ")}
      FROM $tbl
      WHERE $notNull),
    pca_0 AS MATERIALIZED (
      SELECT n, ${rCols.mkString(",\n        ")},
        ${cols.indices.map(i => s"CAST($v0 AS DOUBLE) AS v_$i")
          .mkString(", ")}
      FROM pca_m)""")
    for (t <- 1 to iters) {
      def u(i: Int) = cols.indices
        .map(j => s"${rRef(i, j)} * v_$j").mkString(" + ")
      val nrm = "sqrt(" + cols.indices
        .map(i => s"(${u(i)}) * (${u(i)})").mkString(" + ") + ")"
      sb.append(s""",
    pca_$t AS MATERIALIZED (
      SELECT n, $rPass,
        ${cols.indices.map(i => s"(${u(i)}) / ($nrm) AS v_$i")
          .mkString(",\n        ")},
        $nrm AS nrm
      FROM pca_${t - 1})""")
    }
    val feats = cols.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS feature, round(v_$i, 6) AS loading, " +
        s"round(nrm, 6) AS eigenvalue, " +
        s"round(nrm / CAST($k AS DOUBLE), 6) AS explained_ratio, n " +
        s"FROM pca_$iters"
    }
    sb.append(s""",
    pca AS (
      ${feats.mkString("\n      UNION ALL\n      ")})""")
    sb.toString
  }

  /** Two-feature multiple linear regression by normal equations —
    * closed-form OLS the way it scales: ONE pass accumulates the ten
    * exact-decimal moments (n, ΣX, ΣXᵀX, ΣXᵀy, Σy²), then the 3×3
    * system solves by Cramer's rule in fixed-shape scalar doubles on
    * the one-row frame. No gradient steps, no data-sized float sums.
    * Coefficients snapped at 8, R² at 6; a singular design (collinear
    * or constant features, |det| = 0) yields NULLs, not a silent
    * answer. */
  def ols2(df: DataFrame, x1Col: String, x2Col: String,
      yCol: String): DataFrame = {
    val x1 = dec(col(x1Col))
    val x2 = dec(col(x2Col))
    val y = dec(col(yCol))
    val m = df
      .filter(col(x1Col).isNotNull && col(x2Col).isNotNull
        && col(yCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(x1).cast("decimal(20,2)").as("s1"),
        sum(x2).cast("decimal(20,2)").as("s2"),
        sum(y).cast("decimal(20,2)").as("sy"),
        sum(x1 * x1).cast("decimal(30,4)").as("s11"),
        sum(x2 * x2).cast("decimal(30,4)").as("s22"),
        sum(x1 * x2).cast("decimal(30,4)").as("s12"),
        sum(x1 * y).cast("decimal(30,4)").as("s1y"),
        sum(x2 * y).cast("decimal(30,4)").as("s2y"),
        sum(y * y).cast("decimal(30,4)").as("syy"))
    def D(c: String) = col(c).cast("double")
    def det3(a: Column, b: Column, c: Column, d: Column, e: Column,
        f: Column, g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val (n, s1, s2, sy) = (D("n"), D("s1"), D("s2"), D("sy"))
    val (s11, s22, s12) = (D("s11"), D("s22"), D("s12"))
    val (s1y, s2y, syy) = (D("s1y"), D("s2y"), D("syy"))
    val dd = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val d0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val d2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    val b0 = d0 / dd
    val b1 = d1 / dd
    val b2 = d2 / dd
    val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    val sst = syy - sy * sy / n
    m.select(col("n"),
      when(dd =!= 0.0, round(b0, 8)).as("beta0"),
      when(dd =!= 0.0, round(b1, 8)).as("beta1"),
      when(dd =!= 0.0, round(b2, 8)).as("beta2"),
      when(dd =!= 0.0 && sst > 0.0, round(lit(1.0) - sse / sst, 6))
        .as("r2"))
  }

  /** DuckDB mirror of [[ols2]] over `tbl`: emits CTEs ending in `ols2`
    * (n, beta0, beta1, beta2, r2). */
  def sqlOls2Ctes(tbl: String, x1Sql: String, x2Sql: String,
      ySql: String): String = {
    def x(c: String) = s"CAST($c AS DECIMAL(19,2))"
    def D(c: String) = s"CAST($c AS DOUBLE)"
    def det3(a: String, b: String, c: String, d: String, e: String,
        f: String, g: String, h: String, i: String): String =
      s"($a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g) " +
        s"+ $c * ($d * $h - $e * $g))"
    val (n, s1, s2, sy) = (D("n"), D("s1"), D("s2"), D("sy"))
    val (s11, s22, s12) = (D("s11"), D("s22"), D("s12"))
    val (s1y, s2y, syy) = (D("s1y"), D("s2y"), D("syy"))
    val dd = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val d0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val d2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    val b0 = s"(($d0) / ($dd))"
    val b1 = s"(($d1) / ($dd))"
    val b2 = s"(($d2) / ($dd))"
    val sse = s"($syy - $b0 * $sy - $b1 * $s1y - $b2 * $s2y)"
    val sst = s"($syy - $sy * $sy / $n)"
    s"""ols2_m AS (
      SELECT count(*) AS n,
        CAST(sum(${x(x1Sql)}) AS DECIMAL(20,2)) AS s1,
        CAST(sum(${x(x2Sql)}) AS DECIMAL(20,2)) AS s2,
        CAST(sum(${x(ySql)}) AS DECIMAL(20,2)) AS sy,
        CAST(sum(${x(x1Sql)} * ${x(x1Sql)}) AS DECIMAL(30,4)) AS s11,
        CAST(sum(${x(x2Sql)} * ${x(x2Sql)}) AS DECIMAL(30,4)) AS s22,
        CAST(sum(${x(x1Sql)} * ${x(x2Sql)}) AS DECIMAL(30,4)) AS s12,
        CAST(sum(${x(x1Sql)} * ${x(ySql)}) AS DECIMAL(30,4)) AS s1y,
        CAST(sum(${x(x2Sql)} * ${x(ySql)}) AS DECIMAL(30,4)) AS s2y,
        CAST(sum(${x(ySql)} * ${x(ySql)}) AS DECIMAL(30,4)) AS syy
      FROM $tbl
      WHERE ($x1Sql) IS NOT NULL AND ($x2Sql) IS NOT NULL
        AND ($ySql) IS NOT NULL),
    ols2 AS (
      SELECT n,
        CASE WHEN ($dd) <> 0.0 THEN round($b0, 8) END AS beta0,
        CASE WHEN ($dd) <> 0.0 THEN round($b1, 8) END AS beta1,
        CASE WHEN ($dd) <> 0.0 THEN round($b2, 8) END AS beta2,
        CASE WHEN ($dd) <> 0.0 AND ($sst) > 0.0
          THEN round(1.0 - ($sse) / ($sst), 6) END AS r2
      FROM ols2_m)"""
  }

  /** DuckDB mirror of [[groupedLinearFit]] over `tbl`: emits CTE `ols_g`
    * (g, n, slope, intercept). */
  def sqlFitCtes(tbl: String, gSql: String, xSql: String, ySql: String): String =
    s"""ols_m AS (
      SELECT $gSql AS g, count(*) AS n,
        CAST(sum(CAST($xSql AS DECIMAL(7,0))) AS DECIMAL(18,0)) AS sx,
        CAST(sum(CAST($xSql AS DECIMAL(7,0)) * CAST($xSql AS DECIMAL(7,0))) AS DECIMAL(25,0)) AS sxx,
        CAST(sum(CAST($ySql AS DECIMAL(12,2))) AS DECIMAL(16,2)) AS sy,
        CAST(sum(CAST($xSql AS DECIMAL(19,0)) * CAST($ySql AS DECIMAL(12,2))) AS DECIMAL(23,2)) AS sxy
      FROM $tbl
      WHERE ($xSql) IS NOT NULL AND ($ySql) IS NOT NULL
      GROUP BY 1),
    ols_g AS (
      SELECT g, n,
        CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
          floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e8 + 0.5) / 1e8
        END AS slope,
        floor((CAST(sy AS DOUBLE)
               - (CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0 THEN
                    floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e8
                        + 0.5) / 1e8
                  END) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1e6 + 0.5)
          / 1e6 AS intercept
      FROM ols_m)"""
}
