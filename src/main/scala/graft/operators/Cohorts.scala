package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weekly cohort-retention analysis over an event log — the classic
  * "of users first seen in week W, how many were still active N weeks
  * later" triangle behind engagement dashboards and data-freshness audits.
  *
  * Shape: one per-user min (first-seen week), one distinct over
  * (user, active-week) — both map-side combinable — then a bounded
  * (cohort, offset) aggregation. Nothing here is quadratic; the join that
  * attaches a user's cohort to their activity is keyed on the user id and
  * at 100 TB is the standard fact-to-derived-dim equi-join (the cohort
  * frame is #users rows, aggregated from the same scan).
  *
  * Weeks are Monday-truncated calendar weeks in BOTH engines
  * (`date_trunc('week', …)`), and offsets are integer day-differences
  * divided by 7 (exactly divisible by construction) — no timezone or
  * float arithmetic anywhere except the final retention ratio, one
  * division snapped to 8 decimals.
  */
object Cohorts {

  /** (cohort_week, week_offset, n_active, cohort_size, retention_pct),
    * one row per cohort × offset with at least one active user. */
  def weeklyRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))
    val activity = events
      .select(col(userCol),
        to_date(date_trunc("week", col(tsCol))).as("active_week"))
      .distinct()
    val sizes = first.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(first, userCol)
      .withColumn("week_offset",
        (datediff(col("active_week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
      .join(sizes, "cohort_week")
      .withColumn("retention_pct",
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 8))
  }

  /** DuckDB mirror of [[weeklyRetention]] over `FROM (srcSql) src` with
    * columns (u, ts). Emits CTE `cohort_ret` (cohort_week, week_offset,
    * n_active, cohort_size, retention_pct). */
  def sqlCtes(srcSql: String): String = s"""cohort_first AS (
      SELECT u, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM ($srcSql) AS src GROUP BY u),
    cohort_sizes AS (
      SELECT cohort_week, count(*) AS cohort_size
      FROM cohort_first GROUP BY 1),
    cohort_act AS (
      SELECT DISTINCT u, CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM ($srcSql) AS src),
    cohort_ret AS (
      SELECT f.cohort_week,
        CAST(datediff('day', f.cohort_week, a.active_week) / 7 AS INT)
          AS week_offset,
        count(DISTINCT a.u) AS n_active,
        s.cohort_size,
        round(CAST(count(DISTINCT a.u) AS DOUBLE)
          / CAST(s.cohort_size AS DOUBLE), 8) AS retention_pct
      FROM cohort_act a
      JOIN cohort_first f ON a.u = f.u
      JOIN cohort_sizes s ON f.cohort_week = s.cohort_week
      GROUP BY f.cohort_week, 2, s.cohort_size)"""
}
