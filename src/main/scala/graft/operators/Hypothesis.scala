package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Stable.{dec, portableDouble, portableDoubleSigned, sqlPortableDouble, sqlPortableDoubleSigned}

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

  /** One-way ANOVA (fixed-effects F test): does `valueCol`'s mean differ
    * across the levels of `groupCol`? Classic decomposition SS_total =
    * SS_between + SS_within from per-level exact-decimal moments
    * (n, Σx, Σx²) — ONE hash aggregation over the data, then a bounded
    * (k-row) reduction where each level's two float terms (Σx²ᵍ/nᵍ and
    * its within complement) are snapped to DECIMAL(28,4) before the
    * cross-level sum, keeping the statistic combine-order-independent.
    *
    * Output (one row): k_groups, n_total, ss_between, ss_within, f_stat,
    * eta_sq (= SSB/(SSB+SSW), the effect size F alone hides). f_stat is
    * NULL when dof would be degenerate (k < 2 or n ≤ k) or SSW = 0. */
  def anovaOneWay(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = dec(col(valueCol))
    val perLevel = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"),
        sum(x).cast("decimal(20,2)").as("sx_g"),
        sum(x * x).cast("decimal(30,4)").as("sxx_g"))
    // The only float crossing a sum is the SCALE-FREE mean², snapped to
    // a ×10⁴ integer via floor(x·1e4 + 0.5) — pure IEEE double ops that
    // are bit-identical in any engine (a double→DECIMAL cast is NOT:
    // DuckDB rounds the binary value half-even, Spark half-ups the
    // shortest string repr — they disagree on values printing as …5).
    // mean²·1e4 < 2^53 at any n because mean² never grows with n; the
    // SS terms themselves (~n·mean²) have no such bound, which is why
    // the snap happens here and everything after stays exact decimal.
    val meanD = col("sx_g").cast("double") / col("n_g").cast("double")
    val terms = perLevel
      .withColumn("b_g", col("n_g").cast("decimal(14,0)")
        * floor(meanD * meanD * lit(1e4) + lit(0.5)).cast("decimal(20,0)"))
    val agg = terms.agg(
      count(lit(1)).as("k_groups"),
      sum(col("n_g")).as("n_total"),
      sum(col("sx_g")).cast("decimal(24,2)").as("sx_all"),
      sum(col("sxx_g")).cast("decimal(34,4)").as("sxx_all"),
      sum(col("b_g")).cast("decimal(38,0)").as("b_all"))
    val gmeanD = col("sx_all").cast("double") / col("n_total").cast("double")
    val g2 = floor(gmeanD * gmeanD * lit(1e4) + lit(0.5)).cast("decimal(20,0)")
    val ssbDec = (col("b_all") - col("n_total").cast("decimal(14,0)") * g2)
      .cast("decimal(38,0)")
    val sswDec = ((col("sxx_all") * lit(10000)).cast("decimal(38,0)")
      - col("b_all")).cast("decimal(38,0)")
    // portable split-cast, not a direct decimal(38,0)→double cast: the
    // SS terms grow ~n·mean² and pass 2^53 at corpus row counts, where
    // the direct cast is engine-dependent (q174 class, lint rule 8).
    // Signed: the ×10⁴ mean snaps can push a near-zero SS a hair
    // negative in exact arithmetic.
    val ssb = portableDoubleSigned(ssbDec) / lit(1e4)
    val ssw = portableDoubleSigned(sswDec) / lit(1e4)
    val fstat = (ssb / (col("k_groups") - 1).cast("double")) /
      (ssw / (col("n_total") - col("k_groups")).cast("double"))
    agg.select(
      col("k_groups"), col("n_total"),
      ssb.as("ss_between"),
      ssw.as("ss_within"),
      when(col("k_groups") > 1 && col("n_total") > col("k_groups") && ssw > 0.0,
        round(fstat, 6)).as("f_stat"),
      when(ssb + ssw > 0.0, round(ssb / (ssb + ssw), 6)).as("eta_sq"))
  }

  /** DuckDB mirror of [[anovaOneWay]] over `tbl`: emits CTE `anova`
    * with the same six columns. Value decimal declared width 19 for
    * DuckDB's int128 multiply path (see Stable.sqlDsumsq). */
  def sqlAnovaCtes(tbl: String, gSql: String, valSql: String): String = {
    val x = s"CAST($valSql AS DECIMAL(19,2))"
    val meanD = "(CAST(sx_g AS DOUBLE) / CAST(n_g AS DOUBLE))"
    val gmeanD = "(CAST(sx_all AS DOUBLE) / CAST(n_total AS DOUBLE))"
    val ssb = s"(${sqlPortableDoubleSigned(
      "CAST(b_all - CAST(n_total AS DECIMAL(14,0)) * g2 AS DECIMAL(38,0))")} / 1e4)"
    val ssw = s"(${sqlPortableDoubleSigned(
      "CAST(CAST(sxx_all * 10000 AS DECIMAL(38,0)) - b_all AS DECIMAL(38,0))")} / 1e4)"
    val fstat = s"(($ssb) / CAST(k_groups - 1 AS DOUBLE)) / " +
      s"(($ssw) / CAST(n_total - k_groups AS DOUBLE))"
    s"""anova_g AS (
      SELECT $gSql AS g, count(*) AS n_g,
        CAST(sum($x) AS DECIMAL(20,2)) AS sx_g,
        CAST(sum($x * $x) AS DECIMAL(30,4)) AS sxx_g
      FROM $tbl
      WHERE ($valSql) IS NOT NULL AND ($gSql) IS NOT NULL
      GROUP BY 1),
    anova_t AS (
      SELECT n_g, sx_g, sxx_g,
        CAST(n_g AS DECIMAL(14,0))
          * CAST(floor($meanD * $meanD * 1e4 + 0.5) AS DECIMAL(20,0)) AS b_g
      FROM anova_g),
    anova_m AS (
      SELECT count(*) AS k_groups, CAST(sum(n_g) AS BIGINT) AS n_total,
        CAST(sum(sx_g) AS DECIMAL(24,2)) AS sx_all,
        CAST(sum(sxx_g) AS DECIMAL(34,4)) AS sxx_all,
        CAST(sum(b_g) AS DECIMAL(38,0)) AS b_all
      FROM anova_t),
    anova_s AS (
      SELECT k_groups, n_total, sxx_all, b_all,
        CAST(floor($gmeanD * $gmeanD * 1e4 + 0.5) AS DECIMAL(20,0)) AS g2
      FROM anova_m),
    anova AS (
      SELECT k_groups, n_total,
        $ssb AS ss_between,
        $ssw AS ss_within,
        CASE WHEN k_groups > 1 AND n_total > k_groups AND ($ssw) > 0.0
          THEN round($fstat, 6) END AS f_stat,
        CASE WHEN ($ssb) + ($ssw) > 0.0
          THEN round(($ssb) / (($ssb) + ($ssw)), 6) END AS eta_sq
      FROM anova_s)"""
  }

  /** Two-sided normal p-value for a z statistic, P(|Z| ≥ |z|) =
    * erfc(|z|/√2), via the Abramowitz-Stegun 7.1.26 rational
    * approximation (|error| ≤ 1.5·10⁻⁷ — ample for thresholding at
    * conventional α, and stated openly rather than pretending a libm
    * erfc both engines would disagree on). Every op is a fixed-shape
    * IEEE double expression (one exp, one division chain), identical
    * cross-engine; extreme z underflows to exactly 0.0 in both. */
  def normalTwoSidedP(z: Column): Column = {
    val x = abs(z) / lit(1.4142135623730951)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t + lit(-1.453152027)) * t
      + lit(1.421413741)) * t + lit(-0.284496736)) * t
      + lit(0.254829592)) * t
    poly * exp(-x * x)
  }

  /** DuckDB mirror of [[normalTwoSidedP]] for a z expression. */
  def sqlNormalTwoSidedP(zSql: String): String = {
    val x = s"(abs($zSql) / 1.4142135623730951)"
    val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"(((((1.061405429 * $t + -1.453152027) * $t " +
      s"+ 1.421413741) * $t + -0.284496736) * $t + 0.254829592) * $t)"
    s"($poly * exp(-$x * $x))"
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) between rows where `flagCol` is
    * true (arm A) and false (arm B) — the distribution-free "is A
    * stochastically larger" test, the robust sibling of [[welchTwoSample]]
    * for skewed metrics. Midranks for ties come from cumulative counts
    * over the DISTINCT-value frame ([[PrefixSum.running]] — never a
    * row-level global window), doubled so every quantity stays an exact
    * integer: 2·midrank = 2·cum − n_v + 1, 2·U_a = Σ 2·R_a − n_a(n_a+1).
    * The normal-approximation z carries the standard tie correction
    * Σ(t³−t); everything enters the final double expression as an exact
    * decimal.
    *
    * Output (one row): n_a, n_b, u_stat (U of arm A), z_stat (NULL when
    * the tie-corrected variance is 0), r_rank_biserial (2U/(n_a·n_b)−1,
    * the effect size). */
  def mannWhitney(df: DataFrame, valueCol: String, flagCol: String,
      nBuckets: Int = 32): DataFrame = {
    val f = col(flagCol)
    val dv = df
      .filter(col(valueCol).isNotNull && f.isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as("nv"), count(when(f, lit(1))).as("na_v"))
    val nvD = col("nv").cast("decimal(12,0)")
    val ranked = PrefixSum.running(dv, "v", "v", "nv", descending = false,
        nBuckets)
      .withColumn("mid2", (col("cum") * 2 - col("nv") + 1).cast("decimal(24,0)"))
    val agg = ranked.agg(
      sum(col("na_v")).as("n_a"),
      sum(col("nv") - col("na_v")).as("n_b"),
      sum(col("na_v").cast("decimal(14,0)") * col("mid2"))
        .cast("decimal(38,0)").as("r2a"),
      sum(nvD * nvD * nvD - nvD).cast("decimal(38,0)").as("ties"))
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val nD = naD + nbD
    // 2U_a = 2R_a − n_a(n_a+1), exact in decimal through the portable
    // split-cast (U reaches n_a·n_b ~ n²/4 — far past 2^53 at corpus
    // row counts, where a direct decimal→double cast is engine-
    // dependent; q174 class, lint rule 8). U ≥ 0 and t³−t ≥ 0 exactly,
    // so the unsigned split applies.
    val u2D = portableDouble(
      (col("r2a") - col("n_a").cast("decimal(20,0)") * (col("n_a") + 1))
        .cast("decimal(38,0)"))
    val tieD = portableDouble(col("ties"))
    val varU = naD * nbD / 12.0 * ((nD + 1.0) - tieD / (nD * (nD - 1.0)))
    agg.select(
      col("n_a"), col("n_b"),
      (u2D / 2.0).as("u_stat"),
      when(col("n_a") > 0 && col("n_b") > 0 && varU > 0.0,
        round((u2D - naD * nbD) / (lit(2.0) * sqrt(varU)), 6)).as("z_stat"),
      when(col("n_a") > 0 && col("n_b") > 0,
        round(u2D / (naD * nbD) - 1.0, 6)).as("r_rank_biserial"))
  }

  /** DuckDB mirror of [[mannWhitney]] over `tbl`: emits CTE `mw` with the
    * same five columns. `flagSql` must be a boolean expression. */
  def sqlMannWhitneyCtes(tbl: String, valSql: String, flagSql: String): String = {
    val naD = "CAST(n_a AS DOUBLE)"
    val nbD = "CAST(n_b AS DOUBLE)"
    val nD = s"($naD + $nbD)"
    val u2D = sqlPortableDouble(
      "CAST(r2a - CAST(n_a AS DECIMAL(20,0)) * (n_a + 1) AS DECIMAL(38,0))")
    val varU = s"$naD * $nbD / 12.0 * (($nD + 1.0) " +
      s"- ${sqlPortableDouble("ties")} / ($nD * ($nD - 1.0)))"
    s"""mw_dv AS (
      SELECT CAST($valSql AS DOUBLE) AS v, count(*) AS nv,
        count(CASE WHEN $flagSql THEN 1 END) AS na_v
      FROM $tbl
      WHERE ($valSql) IS NOT NULL AND ($flagSql) IS NOT NULL
      GROUP BY 1),
    mw_rk AS (
      SELECT v, nv, na_v,
        CAST(2 * sum(CAST(nv AS DECIMAL(18,2))) OVER (
          ORDER BY v ROWS UNBOUNDED PRECEDING) - nv + 1
          AS DECIMAL(24,0)) AS mid2
      FROM mw_dv),
    mw_m AS (
      SELECT CAST(sum(na_v) AS BIGINT) AS n_a,
        CAST(sum(nv - na_v) AS BIGINT) AS n_b,
        CAST(sum(CAST(na_v AS DECIMAL(14,0)) * mid2) AS DECIMAL(38,0)) AS r2a,
        CAST(sum(CAST(nv AS HUGEINT) * CAST(nv AS HUGEINT)
          * CAST(nv AS HUGEINT) - CAST(nv AS HUGEINT))
          AS DECIMAL(38,0)) AS ties
      FROM mw_rk),
    mw AS (
      SELECT n_a, n_b,
        $u2D / 2.0 AS u_stat,
        CASE WHEN n_a > 0 AND n_b > 0 AND ($varU) > 0.0 THEN
          round(($u2D - $naD * $nbD) / (2.0 * sqrt($varU)), 6)
        END AS z_stat,
        CASE WHEN n_a > 0 AND n_b > 0 THEN
          round($u2D / ($naD * $nbD) - 1.0, 6)
        END AS r_rank_biserial
      FROM mw_m)"""
  }

  /** Two-sample Kolmogorov-Smirnov D between rows where `flagCol` is
    * true (arm A) and false (arm B): the max gap between the two
    * empirical CDFs — the drift test that sees SHAPE changes a mean test
    * misses. Per distinct value, both cumulative counts come from
    * [[PrefixSum.running]]; the gap maximized is the exact integer
    * |ca·n_b − cb·n_a|, divided once at the end, so D is bit-exact at
    * any partitioning. Also emits the scaled statistic
    * √(n_a·n_b/(n_a+n_b))·D that KS tables take.
    *
    * Output (one row): n_a, n_b, d_stat, ks_stat. */
  def ksTwoSample(df: DataFrame, valueCol: String, flagCol: String,
      nBuckets: Int = 32): DataFrame = {
    val f = col(flagCol)
    val dv = df
      .filter(col(valueCol).isNotNull && f.isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(count(when(f, lit(1))).as("na_v"), count(when(!f, lit(1))).as("nb_v"))
    val ca = PrefixSum.running(dv, "v", "v", "na_v", descending = false,
        nBuckets)
      .select(col("v"), col("cum").cast("decimal(20,0)").as("ca"))
    val cb = PrefixSum.running(dv.select(col("v"), col("nb_v")), "v", "v",
        "nb_v", descending = false, nBuckets)
      .select(col("v"), col("cum").cast("decimal(20,0)").as("cb"))
    val tot = dv.agg(sum(col("na_v")).as("n_a"), sum(col("nb_v")).as("n_b"))
    val gaps = ca.join(cb, "v").crossJoin(broadcast(tot))
    val agg = gaps.agg(
      max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
      max(abs(col("ca") * col("n_b") - col("cb") * col("n_a")))
        .cast("decimal(38,0)").as("d_num"))
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val d = col("d_num").cast("double") / (naD * nbD)
    agg.select(col("n_a"), col("n_b"),
      round(d, 8).as("d_stat"),
      round(sqrt(naD * nbD / (naD + nbD)) * d, 6).as("ks_stat"))
  }

  /** DuckDB mirror of [[ksTwoSample]] over `tbl`: emits CTE `ks` with
    * the same four columns. */
  def sqlKsCtes(tbl: String, valSql: String, flagSql: String): String = {
    val naD = "CAST(n_a AS DOUBLE)"
    val nbD = "CAST(n_b AS DOUBLE)"
    val d = s"CAST(d_num AS DOUBLE) / ($naD * $nbD)"
    s"""ks_dv AS (
      SELECT CAST($valSql AS DOUBLE) AS v,
        count(CASE WHEN $flagSql THEN 1 END) AS na_v,
        count(CASE WHEN NOT ($flagSql) THEN 1 END) AS nb_v
      FROM $tbl
      WHERE ($valSql) IS NOT NULL AND ($flagSql) IS NOT NULL
      GROUP BY 1),
    ks_c AS (
      SELECT v,
        CAST(sum(CAST(na_v AS DECIMAL(18,2))) OVER (
          ORDER BY v ROWS UNBOUNDED PRECEDING) AS DECIMAL(20,0)) AS ca,
        CAST(sum(CAST(nb_v AS DECIMAL(18,2))) OVER (
          ORDER BY v ROWS UNBOUNDED PRECEDING) AS DECIMAL(20,0)) AS cb
      FROM ks_dv),
    ks_t AS (
      SELECT CAST(sum(na_v) AS BIGINT) AS n_a,
        CAST(sum(nb_v) AS BIGINT) AS n_b
      FROM ks_dv),
    ks_m AS (
      SELECT t.n_a, t.n_b,
        CAST(max(abs(c.ca * t.n_b - c.cb * t.n_a)) AS DECIMAL(38,0)) AS d_num
      FROM ks_c c CROSS JOIN ks_t t
      GROUP BY t.n_a, t.n_b),
    ks AS (
      SELECT n_a, n_b,
        round($d, 8) AS d_stat,
        round(sqrt($naD * $nbD / ($naD + $nbD)) * ($d), 6) AS ks_stat
      FROM ks_m)"""
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
