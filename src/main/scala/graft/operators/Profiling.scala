package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-profiling operators — the reference's EDA surface (SURVEY.md §2.4:
  * A1 shape, A2 null audit, A3 duplicate audit, A4/A5 value frequencies,
  * A7 mode). Reference cells: `Loan Prediction using Data Engineering &
  * Machine Learning.ipynb:554-556, 593, 626, 647, 669, 703-731`.
  *
  * Every operator here is a single distributed aggregation pass — no
  * driver-side iteration — so each runs in one Spark job whose cost is one
  * scan plus a tiny shuffle, at any scale.
  */
object Profiling {

  /** A2: per-column null counts, one pass, one row out (pandas
    * `df.isnull().sum()`). 100 TB cost: one scan, no shuffle beyond the
    * final single-row combine. */
  def nullCounts(df: DataFrame): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c =>
      sum(col(c).isNull.cast("long")).as(c)): _*)

  /** A3: surplus full-row duplicate count (pandas `df.duplicated().sum()`).
    * Implemented as a hash aggregation on all columns (map-side partial
    * aggregation keeps the shuffle proportional to the number of *distinct*
    * rows, not input rows). */
  def duplicateCount(df: DataFrame): DataFrame =
    df.groupBy(df.columns.toIndexedSeq.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("dup_rows"))

  /** A4/A5: value frequencies with normalized share (pandas
    * `value_counts(normalize=True)`). The empty-frame window runs over the
    * *aggregated* frame (cardinality = #distinct values), so the single
    * partition it implies is fine even at 100 TB input. */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .withColumn("share",
        round(col("cnt") / sum(col("cnt")).over(Window.partitionBy()), 6))
      .orderBy(desc("cnt"), col(c))

  /** A7: most frequent value with deterministic ties (smallest value wins,
    * matching sklearn `SimpleImputer(strategy='most_frequent')`). */
  def mode(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(c)).limit(1).select(col(c))

  /** A1/A6: (rows, cols) shape as a 1-row frame. */
  def shape(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n_rows"))
      .withColumn("n_cols", lit(df.columns.length))

  /** pandas `df.describe()` analog in long form — the full
    * count/mean/std/min/25%/50%/75%/max panel for any number of numeric
    * columns in ONE melt + ONE aggregation pass (no per-column scan loop).
    * The mean is combine-order-independent ([[graft.functions.Stable.davg]]);
    * std comes from exact-decimal first/second moments via the textbook
    * identity (identical IEEE ops on identical doubles in both engines);
    * quartiles use exact type-7 interpolated percentile. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    import graft.functions.Stable.{davg, dsum, dsumsq}
    val stackExpr = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    val v = col("v")
    val n = count(v)
    val s1 = dsum(v)
    val s2 = dsumsq(v)
    df.select(expr(s"stack(${cols.length}, $stackExpr) as (col_name, v)"))
      .groupBy(col("col_name"))
      .agg(
        n.as("n"),
        davg(v).as("mean"),
        // greatest(0, ·): the independently-rounded moments can put the
        // identity a few ulps below zero for (near-)constant columns —
        // pandas describe() returns 0.0 there, never NaN. The final
        // round(·, 4): at ~19-significant-digit second moments the
        // decimal→double CAST itself rounds differently across engines
        // (measured: one ulp at sf0.1), so std is reported at 4 decimals
        round(sqrt(greatest(lit(0.0), (s2 - s1 * s1 / n) / (n - 1))), 4).as("std"),
        min(v).as("min_v"),
        expr("percentile(v, 0.25D)").as("p25"),
        expr("percentile(v, 0.5D)").as("median"),
        expr("percentile(v, 0.75D)").as("p75"),
        max(v).as("max_v"))
      .orderBy(col("col_name"))
  }

  /** Fixed-width histogram of a numeric column over [lo, hi): one scan,
    * one tiny hash agg — the EDA binning step (pandas `cut` +
    * `value_counts`). Bin edges are explicit parameters (not data-derived
    * min/max) so the plan is one pass and the bin function is a pure
    * expression both engines compute identically; values outside the
    * range clamp to the edge bins. */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo, got $bins, [$lo,$hi)")
    val width = (hi - lo) / bins
    val bin = least(greatest(
      floor((col(c) - lo) / width).cast("long"), lit(0L)), lit(bins - 1L))
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin") * width)
      .select(col("bin"), col("bin_lo"), col("n"))
      .orderBy(col("bin"))
  }

  /** The 100 TB face of [[describe]]: same panel, quartiles via
    * `approx_percentile` (Greenwald-Khanna sketch, mergeable partials)
    * instead of exact `percentile`. The exact aggregator buffers a
    * value→count map per group — proportional to DISTINCT values, which
    * for continuous measures at corpus scale means executor-memory
    * pressure; the sketch is bounded by the accuracy parameter instead.
    * Error ≤ 1/accuracy quantile-rank units (OperatorsSpec pins it against
    * the exact panel). Not oracle-paired: sketch internals differ across
    * engines, so cross-engine hash equality is not meaningful. */
  def describeApprox(df: DataFrame, cols: Seq[String],
      accuracy: Int = 10000): DataFrame = {
    import graft.functions.Stable.{davg, dsum, dsumsq}
    val stackExpr = cols.map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    val v = col("v")
    val n = count(v)
    val s1 = dsum(v)
    val s2 = dsumsq(v)
    df.select(expr(s"stack(${cols.length}, $stackExpr) as (col_name, v)"))
      .groupBy(col("col_name"))
      .agg(
        n.as("n"),
        davg(v).as("mean"),
        // greatest(0, ·): the independently-rounded moments can put the
        // identity a few ulps below zero for (near-)constant columns —
        // pandas describe() returns 0.0 there, never NaN. The final
        // round(·, 4): at ~19-significant-digit second moments the
        // decimal→double CAST itself rounds differently across engines
        // (measured: one ulp at sf0.1), so std is reported at 4 decimals
        round(sqrt(greatest(lit(0.0), (s2 - s1 * s1 / n) / (n - 1))), 4).as("std"),
        min(v).as("min_v"),
        expr(s"approx_percentile(v, 0.25D, $accuracy)").as("p25"),
        expr(s"approx_percentile(v, 0.5D, $accuracy)").as("median"),
        expr(s"approx_percentile(v, 0.75D, $accuracy)").as("p75"),
        max(v).as("max_v"))
      .orderBy(col("col_name"))
  }

  /** Join-key skew audit — the pre-flight check that decides whether a
    * join needs [[SkewJoin]] salting or AQE skew handling BEFORE a 100 TB
    * shuffle discovers the hot key the hard way. One row per audited key:
    * row/key totals, the per-key count distribution (exact type-7 p50/p99
    * + max), the hottest key's share of all rows, and skew_ratio =
    * max/avg (1.0 = perfectly uniform). Shape: one keyed count, then one
    * aggregation over the #keys-row counts frame — NULL keys count as a
    * key, exactly as a shuffle hashes them. */
  def keySkew(df: DataFrame, keyCol: String, label: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        expr("percentile(cnt, 0.5D)").as("p50_cnt"),
        expr("percentile(cnt, 0.99D)").as("p99_cnt"),
        max(col("cnt")).as("max_cnt"))
      .select(lit(label).as("audit"), col("n_rows"), col("n_keys"),
        round(col("n_rows").cast("double") / col("n_keys").cast("double"), 8)
          .as("avg_cnt"),
        col("p50_cnt"), col("p99_cnt"), col("max_cnt"),
        round(col("max_cnt").cast("double") / col("n_rows").cast("double"), 8)
          .as("top1_share"),
        round(col("max_cnt").cast("double") * col("n_keys").cast("double")
          / col("n_rows").cast("double"), 8).as("skew_ratio"))

  /** DuckDB mirror of [[keySkew]]: one SELECT over `tbl` grouped by
    * `keySql`. */
  def sqlKeySkew(label: String, tbl: String, keySql: String): String = s"""
    SELECT '$label' AS audit,
      CAST(sum(cnt) AS BIGINT) AS n_rows,
      count(*) AS n_keys,
      round(CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE), 8) AS avg_cnt,
      quantile_cont(cnt, 0.5) AS p50_cnt,
      quantile_cont(cnt, 0.99) AS p99_cnt,
      max(cnt) AS max_cnt,
      round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 8) AS top1_share,
      round(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
        / CAST(sum(cnt) AS DOUBLE), 8) AS skew_ratio
    FROM (SELECT count(*) AS cnt FROM $tbl GROUP BY $keySql)"""

  /** Robust per-group outlier audit via MAD (median absolute deviation) —
    * the outlier gate that, unlike mean±kσ, is not dragged by the
    * outliers it is trying to find (50% breakdown point vs 0; Hampel '74,
    * Leys et al. '13). Flags values with |x − median| > k·MAD; the
    * conventional k ≈ 3 on raw MAD units (no 1.4826 σ-consistency factor
    * — counts, not z-scores, are reported).
    *
    * Scale shape: two grouped exact-percentile aggregations (median, then
    * MAD of deviations) with the tiny per-group stats BROADCAST back onto
    * the scan each time — the fact table shuffles only its group-keyed
    * aggregation rows, never re-sorts globally. Exact `percentile` buffers
    * per-group distinct values (the [[describeApprox]] caveat); swap in
    * approx_percentile for continuous measures at extreme group
    * cardinality. Determinism: type-7 interpolation parity is established
    * by q19/q62; subtraction and the k·MAD threshold are single IEEE ops
    * on identical doubles. */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    val x = col(valCol)
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile(`$valCol`, 0.5D)").as("med"))
    val dev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("adev", abs(x - col("med")))
    val mad = dev.groupBy(col(groupCol), col("med"))
      .agg(expr("percentile(adev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), Seq(groupCol, "med"))
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("adev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col(groupCol), col("n"), col("med"), col("mad"),
        col("n_outliers"))
  }
}
