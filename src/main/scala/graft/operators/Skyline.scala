package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) per group: the rows not dominated by any
  * other row that is better-or-equal on both axes and strictly better on
  * one (Börzsönyi et al. '01, the SKYLINE OF operator).
  *
  * The naive definition is an O(n²) self-join; the sort-based plan here is
  * one window per group: order by the maximized column descending (ties
  * broken by the minimized column ascending), keep a row iff its minimized
  * value is strictly below the running minimum of all preceding rows —
  * every preceding row is ≥ on the maximize axis, so "not dominated" is
  * exactly "strictly better on the minimize axis than everything before
  * me". O(n log n), no pairwise comparisons, same shuffle as any grouped
  * sort.
  *
  * Precondition (asserted by the caller's data model, checked in the
  * spec): `minimizeCol` values are unique within a group. With duplicate
  * (max, min) points the running-min rule would keep only the first of an
  * incomparable tie pair; dedupe to distinct points first if that can
  * occur.
  */
object Skyline {

  /** Rows of `df` on the (maximize `maxCol`, minimize `minCol`) frontier,
    * per group. Preserves all input columns. */
  def frontier2d(df: DataFrame, groupCols: Seq[String], maxCol: String,
      minCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(maxCol).desc, col(minCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__min_prev", min(col(minCol)).over(w))
      .filter(col("__min_prev").isNull || col(minCol) < col("__min_prev"))
      .drop("__min_prev")
  }
}
