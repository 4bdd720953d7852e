package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse a change log
  * — one row per observation of a key's attributes — into validity
  * intervals `[effective_from, effective_to)`, one row per ACTUAL change,
  * with `effective_to` NULL on each key's current row. The standard
  * warehouse dimension-versioning operator (Kimball's SCD2), derivable
  * here entirely from the log; the reference's MySQL upsert
  * (MySQL_Data_Loading.ipynb:515-527) is the degenerate type-1 form of the
  * same history (last write wins), which [[graft.sources.JdbcUpsert]]
  * covers.
  *
  * Scale shape: ONE shuffle on the key columns, then two window passes
  * over the same partitioning (Catalyst reuses the exchange and sort):
  * `lag` to detect changes, `lead` on the survivors to close intervals.
  * Per-key state is bounded by that key's history — no global state, no
  * driver involvement; skew is bounded by the hottest key's log, same as
  * any window.
  *
  * Determinism: `tieBreakCol` must make (keys, ts, tieBreak) unique, or
  * same-instant observations would collapse nondeterministically. Change
  * detection is null-safe (`<=>` on the attribute struct), so NULL→value
  * and value→NULL transitions are real changes and NULL→NULL is not.
  */
object Scd2 {

  /** @param keyCols     dimension key (partition of the history)
    * @param tsCol       observation timestamp
    * @param attrCols    tracked attributes: a new row is opened whenever
    *                    any of them changes
    * @param tieBreakCol unique-ifier within (keys, ts), e.g. the source
    *                    row's primary key
    * @return keys ++ attrs ++ (effective_from, effective_to, tie break) */
  def fromChangeLog(log: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String], tieBreakCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need keys and attrs")
    val order = Seq(col(tsCol), col(tieBreakCol))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    val changes = log
      .withColumn("__prev", lag(attrs, 1).over(w))
      // first observation (prev NULL struct) always opens a row; <=> makes
      // attribute-level NULLs compare by value, not SQL three-valued logic
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
      .drop("__prev")
    // lead over the SAME key partitioning and order, on the survivors only
    // — the next change (not the next observation) closes the interval
    changes
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .select((keyCols ++ attrCols).map(col) ++ Seq(
        col("effective_from"), col("effective_to"), col(tieBreakCol)): _*)
  }
}
