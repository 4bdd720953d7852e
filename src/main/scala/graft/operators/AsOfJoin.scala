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
}
