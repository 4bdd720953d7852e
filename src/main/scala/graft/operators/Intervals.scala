package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed validity/activity spans — the two
  * operations every warehouse eventually needs and naive SQL gets wrong:
  *
  *  - [[unionLength]]: how much TIME is covered per key once overlapping
  *    intervals are merged (double-counting is the classic bug: summing
  *    raw durations over overlapping spans can exceed the calendar);
  *  - [[calendarize]]: spread a value over the calendar buckets an
  *    interval touches, proportionally to day overlap (the finance/
  *    revenue-recognition operator: a 3-month contract contributes to
  *    three monthly P&Ls, not to its start month).
  *
  * Both stay in exact integer day arithmetic; calendarize's single
  * rational weight is snapped via floor(x·10⁶+0.5) — pure IEEE double
  * ops, bit-identical in any engine (a double→DECIMAL cast is not; see
  * Hypothesis.anovaOneWay).
  *
  * Scale shape: unionLength is one keyed window (partition = the key,
  * never global) + one hash agg; calendarize is an explode bounded by
  * months-per-interval then one hash agg — both shuffle once on their
  * natural key.
  */
object Intervals {

  /** Per-key union of half-open integer intervals [start, end): merges
    * overlaps/adjacency via the gaps-and-islands running max, then sums
    * island extents. `startCol`/`endCol` must be integral (e.g. epoch
    * days); `tieCol` makes the within-key order total. Output per key:
    * n_intervals, n_islands, covered (Σ island extents, exact long).
    * Intervals with end ≤ start are rejected loudly. */
  def unionLength(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tieCol: String): DataFrame = {
    val k = col(keyCol)
    val rawS = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    // guard folded into the USED column — a free-standing check column
    // would be pruned by the optimizer and never evaluate
    val s = when(e <= rawS,
      raise_error(concat(lit("Intervals.unionLength: end <= start for key "),
        k.cast("string")))).otherwise(rawS)
    val ord = Seq(s.asc, e.asc, col(tieCol).asc)
    val wPrev = Window.partitionBy(k).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(k).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = df
      .withColumn("__new", when(coalesce(max(e).over(wPrev), lit(Long.MinValue))
        < s, lit(1L)).otherwise(lit(0L)))
      .withColumn("__island", sum(col("__new")).over(wRun))
    flagged
      .groupBy(k, col("__island"))
      .agg(count(lit(1)).as("__n"), min(s).as("__is"), max(e).as("__ie"))
      .groupBy(k)
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered"))
  }

  /** DuckDB mirror of [[unionLength]]: emits CTEs ending in `iv_u`
    * (key, n_intervals, n_islands, covered). `src` must expose columns
    * k, s, e, tie. */
  def sqlUnionLengthCtes(src: String): String = s"""
    iv_f AS (
      SELECT k, s, e, tie,
        CASE WHEN coalesce(max(e) OVER (PARTITION BY k ORDER BY s, e, tie
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          -9223372036854775807) < s THEN 1 ELSE 0 END AS newi
      FROM $src),
    iv_i AS (
      SELECT k, s, e,
        sum(newi) OVER (PARTITION BY k ORDER BY s, e, tie
          ROWS UNBOUNDED PRECEDING) AS island
      FROM iv_f),
    iv_g AS (
      SELECT k, island, count(*) AS n, min(s) AS is_, max(e) AS ie
      FROM iv_i GROUP BY 1, 2),
    iv_u AS (
      SELECT k, CAST(sum(n) AS BIGINT) AS n_intervals,
        count(*) AS n_islands,
        CAST(sum(ie - is_) AS BIGINT) AS covered
      FROM iv_g GROUP BY 1)"""

  /** Spread `valueCol` over the months an inclusive day-range
    * [startCol, endCol] touches, weighted by day overlap. Inputs are
    * DATE columns; rows with end < start are rejected loudly. Each
    * slice's allocation value·(overlap/total) is snapped to a ×10⁶
    * integer (floor(x·1e6+0.5)) so the per-month sums are exact and
    * partitioning-independent. Output per month: n_slices, allocated. */
  def calendarize(df: DataFrame, startCol: String, endCol: String,
      valueCol: String): DataFrame = {
    val rawS = col(startCol)
    val e = col(endCol)
    // guard folded into the USED column (see unionLength)
    val s = when(e < rawS,
      raise_error(lit("Intervals.calendarize: end < start"))).otherwise(rawS)
    val exploded = df
      .withColumn("month", explode(sequence(trunc(s, "MM"), trunc(e, "MM"),
        expr("interval 1 month"))))
    val overlap = (datediff(least(e, last_day(col("month"))),
      greatest(s, col("month"))) + 1).cast("double")
    val total = (datediff(e, s) + 1).cast("double")
    val allocScaled = floor(col(valueCol).cast("double") * overlap / total
      * lit(1e6) + lit(0.5)).cast("decimal(24,0)")
    exploded
      .groupBy(col("month"))
      // portable split-cast: the ×10⁶ monthly total passes 2^53 at
      // corpus revenue volumes, where a direct decimal→double cast is
      // engine-dependent (q174 class, lint rule 8); signed because the
      // operator is generic over v's sign
      .agg(count(lit(1)).as("n_slices"),
        (graft.functions.Stable.portableDoubleSigned(
          sum(allocScaled).cast("decimal(38,0)")) / lit(1e6))
          .as("allocated"))
  }

  /** DuckDB mirror of [[calendarize]]: emits CTEs ending in `cal_m`
    * (month, n_slices, allocated). `src` must expose columns s, e
    * (DATE) and v (the value). */
  def sqlCalendarizeCtes(src: String): String = s"""
    cal_x AS (
      SELECT s, e, v,
        CAST(unnest(generate_series(date_trunc('month', s),
          date_trunc('month', e), INTERVAL 1 MONTH)) AS DATE) AS month
      FROM $src),
    cal_a AS (
      SELECT month,
        CAST(floor(CAST(v AS DOUBLE)
          * CAST(date_diff('day', greatest(s, month),
              least(e, last_day(month))) + 1 AS DOUBLE)
          / CAST(date_diff('day', s, e) + 1 AS DOUBLE)
          * 1e6 + 0.5) AS DECIMAL(24,0)) AS alloc_scaled
      FROM cal_x),
    cal_m AS (
      SELECT month, count(*) AS n_slices,
        ${graft.functions.Stable.sqlPortableDoubleSigned(
          "CAST(sum(alloc_scaled) AS DECIMAL(38,0))")} / 1e6
          AS allocated
      FROM cal_a GROUP BY 1)"""
}
