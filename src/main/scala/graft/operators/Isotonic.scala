package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone) regression over binned unit data — the
  * shape-constrained calibration primitive (Platt's rival): given per-unit
  * (score, outcome∈{0,1}) observations, fit the least-squares
  * NON-DECREASING probability curve over scores. This is the classical
  * pool-adjacent-violators (PAV) solution (Ayer et al. 1955; Barlow &
  * Brunk 1972), computed here through its minimax closed form
  *
  *   iso(i) = max_{j ≤ i} min_{k ≥ i} mean(y over bins j..k)
  *
  * which is algebraically identical to PAV's pooled blocks but needs no
  * sequential pooling pass — it decomposes into bounded-frame window
  * operators, which is what makes it BOTH distributed and
  * oracle-checkable (the same formula runs verbatim in SQL).
  *
  * Scale shape: ONE hash aggregation over the raw units collapses the
  * data to the distinct-score bin frame (bounded by the score domain,
  * e.g. #distinct click-counts — scale-independent for any capped or
  * integer score); everything after runs on B bins: an O(B) prefix sum
  * (global window over the BOUNDED bin frame — the documented exception
  * class), an O(B²) pair frame via broadcast range self-join (never a
  * CartesianProduct), a per-j suffix-min window (partitioned), and a
  * final hash agg. Raw data is touched exactly once.
  *
  * Determinism: interval means are single divisions of exact integer
  * sums (identical IEEE doubles in any engine at any partitioning);
  * min/max over those doubles are exact; rounding happens once at the
  * end. So the fitted curve hash-matches a DuckDB oracle bit-for-bit.
  */
object Isotonic {

  /** Fits the monotone rate curve. `units` must have one row per unit
    * with integral `scoreCol` and 0/1 `posCol`. Returns one row per
    * distinct score: (score, n_units, n_pos, raw_rate, iso_rate),
    * iso_rate non-decreasing in score, both rates rounded to 8 decimals.
    */
  def fitBinned(units: DataFrame, scoreCol: String, posCol: String): DataFrame = {
    // bins is referenced three times (prefix sums, both join sides, the
    // output join) — checkpoint the RAW-DATA aggregation so the units
    // scan runs exactly once (GraphCore's multi-reference rule); the
    // bounded bin frame itself is cheap to rescan. The checkpoint severs
    // lineage (the frame reads as a raw LogicalRDD afterwards), so the
    // boundedness the aggregation established — one row per DISTINCT
    // SCORE, scale-independent — is re-declared for ScaleGuard: the
    // global prefix-sum windows below run on this bin frame only.
    val bins = graft.plans.ScaleGuard.bounded(units
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("n"), sum(col(posCol).cast("long")).as("k"))
      .localCheckpoint())
    // inclusive prefix sums over the bounded bin frame; interval sums
    // j..k are then ck_k − ck_j + k_j (no exclusive-frame edge cases)
    val wCum = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("cn", sum(col("n")).over(wCum))
      .withColumn("ck", sum(col("k")).over(wCum))
    val j = cum.select(col("score").as("js"), col("n").as("nj"),
      col("k").as("kj"), col("cn").as("cnj"), col("ck").as("ckj"))
    val k = cum.select(col("score").as("ks"), col("cn").as("cnk"),
      col("ck").as("ckk"))
    val pairs = j.join(broadcast(k), col("js") <= col("ks"))
      .select(col("js"), col("ks"),
        ((col("ckk") - col("ckj") + col("kj")).cast("double") /
          (col("cnk") - col("cnj") + col("nj")).cast("double")).as("a"))
    // m(j, i) = min over k ≥ i of mean(j..k): per-j suffix min
    val wSuf = Window.partitionBy(col("js")).orderBy(col("ks").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val suf = pairs.withColumn("m", min(col("a")).over(wSuf))
    // iso(i) = max over j ≤ i of m(j, i); every (js ≤ ks) row exists
    val iso = suf.groupBy(col("ks").as("score"))
      .agg(max(col("m")).as("mx"))
    bins.join(iso, "score")
      .select(col("score"), col("n").as("n_units"), col("k").as("n_pos"),
        round(col("k").cast("double") / col("n").cast("double"), 8)
          .as("raw_rate"),
        round(col("mx"), 8).as("iso_rate"))
  }

  /** DuckDB mirror of [[fitBinned]] over a units CTE/table `src` with
    * columns (score, pos): emits CTE `iso_out` with the same five
    * columns. */
  def sqlCtes(src: String): String =
    s"""iso_bins AS (
      SELECT CAST(score AS BIGINT) AS score, count(*) AS n,
        CAST(sum(pos) AS BIGINT) AS k
      FROM $src GROUP BY 1),
    iso_cum AS (
      SELECT *, sum(n) OVER w AS cn, sum(k) OVER w AS ck
      FROM iso_bins
      WINDOW w AS (ORDER BY score ROWS UNBOUNDED PRECEDING)),
    iso_pairs AS (
      SELECT j.score AS js, k.score AS ks,
        CAST(k.ck - j.ck + j.k AS DOUBLE)
          / CAST(k.cn - j.cn + j.n AS DOUBLE) AS a
      FROM iso_cum j JOIN iso_cum k ON j.score <= k.score),
    iso_suf AS (
      SELECT js, ks, min(a) OVER (PARTITION BY js ORDER BY ks DESC
        ROWS UNBOUNDED PRECEDING) AS m
      FROM iso_pairs),
    iso_fit AS (SELECT ks AS score, max(m) AS mx FROM iso_suf GROUP BY 1),
    iso_out AS (
      SELECT b.score, b.n AS n_units, b.k AS n_pos,
        round(CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE), 8) AS raw_rate,
        round(f.mx, 8) AS iso_rate
      FROM iso_bins b JOIN iso_fit f USING (score))"""
}
