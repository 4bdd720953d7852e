package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the dbt-test / Deequ-style pipeline
  * guardrail): each check reduces a table to ONE violation count, the
  * runner unions them into a single audit table. A training-data pipeline
  * runs this between every stage — silently-broken referential integrity
  * or a null-rate spike is how bad batches reach training.
  *
  * Every check is a single aggregation (or one anti-join for referential
  * integrity) producing one row — the audit of a 100 TB table costs one
  * scan per table, the checks over the same table share it via column
  * pruning, and nothing ever collects more than the one-row result.
  */
object DataChecks {

  private def one(df: DataFrame, name: String, violations: Column): DataFrame =
    df.agg(coalesce(violations.cast("long"), lit(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Rows where `c` is NULL. */
  def notNull(df: DataFrame, c: String): DataFrame =
    one(df, s"not_null:$c", count(lit(1)) - count(col(c)))

  /** Duplicate rows over a key (0 ⇔ key is unique). */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    one(df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n")),
      s"unique:${cols.mkString(",")}", sum(col("__n") - 1))

  /** Non-NULL values outside [lo, hi]. */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    one(df, s"range:$c",
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)))

  /** Values not in the accepted set. */
  def acceptedValues(df: DataFrame, c: String, vals: Seq[String]): DataFrame =
    one(df, s"accepted:$c",
      sum(when(col(c).isInCollection(vals) || col(c).isNull, 0L).otherwise(1L)))

  /** Child rows whose foreign key has no parent (NULL fks are violations
    * of notNull, not of integrity — SQL convention). */
  def refIntegrity(child: DataFrame, fk: String, parent: DataFrame,
      pk: String, label: String): DataFrame = {
    val orphans = child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk)).distinct(), col(fk) === col(pk), "left_anti")
    one(orphans, s"ref:$label", count(lit(1)))
  }

  /** Union the one-row checks into the audit table (check, n_violations,
    * pass), ordered by check name. */
  def run(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("check_name"))
}
