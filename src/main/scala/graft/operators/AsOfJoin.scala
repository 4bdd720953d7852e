package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the payload of the
  * LATEST right row with the same keys and `right.ts <= left.ts` — the
  * attribution / last-known-value join Spark has no built-in for.
  *
  * Formulation: tag both sides, union, and run one `last(payload,
  * ignoreNulls) OVER (PARTITION BY keys ORDER BY ts, side)` window — right
  * rows sort before left rows at equal timestamps, so "at or exactly at"
  * rows are visible. Cost: ONE shuffle on the keys + one sort per key
  * group, linear in |L|+|R| — never the range cross-product a naive
  * `l.ts >= r.ts` join condition would plan (broadcast-nested-loop at
  * scale). Skewed keys are bounded by per-key data, same as any window.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to carry (they keep their
    * names — make them distinct from left's columns); rows from the right
    * are matched by `keyCols` and `rightTs <= leftTs`. Left rows with no
    * prior right row get null payloads (left-join semantics).
    *
    * The payload travels as ONE struct filled by a single
    * `last(ignoreNulls)` — filling columns independently would skip
    * value-level nulls and stitch columns from different right rows.
    * Among right rows sharing (keys, ts) the largest payload struct wins
    * (a total, deterministic order; match it in any oracle). */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(
        keyCols.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) :+
          struct(payloadCols.map(col): _*).as("__payload"): _*)
      // a null right timestamp is "no time", not "before all time" (which
      // NULLS FIRST ordering would make it): such rows can never match
      .filter(col("__ts").isNotNull)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__payload").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__filled", last(col("__payload"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(filled) { (df, c) =>
        df.withColumn(c, col(s"__filled.$c"))
      }
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__payload", "__filled")
  }

  /** [[asOf]] with pandas-`merge_asof` tolerance and direction: attach
    * the NEAREST right row within `toleranceSeconds`, looking backward
    * (`right.ts ∈ [left.ts − tol, left.ts]`) or forward
    * (`right.ts ∈ [left.ts, left.ts + tol]`). Also emits `asof_ts` — the
    * matched right timestamp — since bounded-staleness joins almost
    * always need the actual lag downstream.
    *
    * Same one-shuffle union+window plan as [[asOf]]; `forward` simply
    * reverses the traversal (ts DESC), so the running `last` holds the
    * nearest FOLLOWING right row when each left row is reached. The
    * tolerance is applied after the fill as an integer-microsecond bound
    * — rows outside it revert to null payloads (left-join semantics).
    * Tie policy at equal distance: the largest payload struct wins,
    * deterministic — match `max(payload)` in any oracle. */
  def asOfTolerance(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      toleranceSeconds: Long, forward: Boolean = false): DataFrame = {
    require(toleranceSeconds > 0,
      s"toleranceSeconds must be positive, got $toleranceSeconds")
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right.select(
        keyCols.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) :+
          struct(col(rightTs).as("__rts") +: payloadCols.map(col): _*)
            .as("__payload"): _*)
      .filter(col("__ts").isNotNull)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val ord = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(ord, col("__side"), col("__payload").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__filled", last(col("__payload"), ignoreNulls = true).over(w))
    val delta =
      if (forward) unix_micros(col("__filled.__rts")) - unix_micros(col("__ts"))
      else unix_micros(col("__ts")) - unix_micros(col("__filled.__rts"))
    val ok = col("__filled").isNotNull && delta <= toleranceSeconds * 1000000L
    payloadCols.foldLeft(filled) { (df, c) =>
        df.withColumn(c, when(ok, col(s"__filled.$c")))
      }
      .withColumn("asof_ts", when(ok, col("__filled.__rts")))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__payload", "__filled")
  }
}
