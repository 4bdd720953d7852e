package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped ROC-AUC via the Mann–Whitney U statistic — distributed model
  * evaluation without ever materializing an ROC curve.
  *
  * `AUC = P(score_pos > score_neg) + ½·P(score_pos = score_neg)`, computed
  * from tie-averaged ranks: with R⁺ the sum of positives' average ranks,
  * `AUC = (R⁺ − P(P+1)/2) / (P·N)`. Per-group evaluation (per segment, per
  * data slice) is how eval suites detect that a model is good on average
  * but broken on a slice.
  *
  * Exactness: average ranks are half-integers, so the implementation keeps
  * 2·R⁺ as a BIGINT (`Σ (2·rank + ties − 1)` over positives) and performs
  * ONE double division at the end — `(2R⁺ − P(P+1)) / (2·P·N)` — which is
  * bit-identical across engines (same integer numerator and denominator,
  * one correctly-rounded IEEE op). No rounding snap needed.
  *
  * Scale shape: one rank window per group (a sort within each group's
  * partition — the same shuffle an ORDER BY-per-key would cost), then one
  * hash aggregation. Groups are independent; skewed groups can be salted
  * upstream. Degenerate groups (no positives or no negatives) yield NULL.
  */
object Auc {

  /** Per-group AUC of `scoreCol` predicting binary `labelCol` (0/1).
    * Output: (group…, n, pos, auc). */
  def groupedAuc(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    val grp = groupCols.map(col)
    val wRank = Window.partitionBy(grp: _*).orderBy(col(scoreCol))
    val wTies = Window.partitionBy(grp :+ col(scoreCol): _*)
    // 2 * tie-averaged rank = 2*rank_min + ties - 1 (integer, exact)
    val rank2 = lit(2L) * rank().over(wRank) + count(lit(1)).over(wTies) - 1L
    val scored = df.select(grp :+ col(scoreCol) :+
      col(labelCol).cast("long").as("y"): _*)
      .withColumn("r2", rank2)
    scored.groupBy(grp: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("pos"),
        sum(when(col("y") === 1L, col("r2")).otherwise(0L)).as("rpos2"))
      .withColumn("neg", col("n") - col("pos"))
      .withColumn("auc",
        when(col("pos") > 0L && col("neg") > 0L,
          (col("rpos2") - col("pos") * (col("pos") + 1L)).cast("double") /
            (lit(2L) * col("pos") * col("neg")).cast("double")))
      .select(grp :+ col("n") :+ col("pos") :+ col("auc"): _*)
  }

  /** DuckDB mirror of [[groupedAuc]] over `tbl`: emits CTE `auc_g`
    * (g, n, pos, auc) for group expression `gSql`, score `scoreSql`,
    * 0/1 label `labelSql`. */
  def sqlAucCtes(tbl: String, gSql: String, scoreSql: String,
      labelSql: String): String =
    s"""auc_ranked AS (
      SELECT $gSql AS g, CAST($labelSql AS BIGINT) AS y,
        2 * rank() OVER (PARTITION BY $gSql ORDER BY $scoreSql)
          + count(*) OVER (PARTITION BY $gSql, $scoreSql) - 1 AS r2
      FROM $tbl),
    auc_g AS (
      SELECT g, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
        CASE WHEN sum(y) > 0 AND count(*) - sum(y) > 0 THEN
          CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END)
                 - sum(y) * (sum(y) + 1) AS DOUBLE)
            / CAST(2 * sum(y) * (count(*) - sum(y)) AS DOUBLE)
        END AS auc
      FROM auc_ranked GROUP BY g)"""
}
