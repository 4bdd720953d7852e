package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining: first-order Markov transition matrices and
  * frequent session paths — the behavioral-analytics layer over a
  * sessionized event log (user-journey modeling, bot detection via
  * improbable transitions, funnel discovery without pre-declared stages).
  *
  * Both operators ride the same (user, time, id) window ordering that
  * [[Sessionize]] uses, so the per-user sort is the only wide stage and
  * scales with per-user event volume, never total volume. Counts are
  * integers; each probability is one final division snapped to 8 decimals.
  */
object Sequences {

  /** First-order Markov transition matrix of `tokCol` between consecutive
    * events per partition key: (from_tok, to_tok, n, n_from, p) where p is
    * the row-normalized transition probability. The deterministic order
    * inside a partition is (tsCol, idCol) — id breaks timestamp ties. */
  def transitions(df: DataFrame, partCol: String, tsCol: String,
      idCol: String, tokCol: String): DataFrame = {
    val order = Window.partitionBy(col(partCol)).orderBy(col(tsCol), col(idCol))
    val rowTot = Window.partitionBy(col("from_tok"))
    df.withColumn("to_tok", lead(col(tokCol), 1).over(order))
      .filter(col("to_tok").isNotNull)
      .groupBy(col(tokCol).as("from_tok"), col("to_tok"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from", sum(col("n")).over(rowTot))
      .withColumn("p",
        round(col("n").cast("double") / col("n_from").cast("double"), 8))
  }

  /** Top-k most frequent session paths: each gap-bounded session's ordered
    * token sequence joined into one `path` string, counted, heaviest
    * first (ties broken on the path text — the top-k cut is total).
    *
    * Rows with a NULL token or NULL user are excluded BEFORE
    * sessionizing: a step with no token cannot appear in a path, and
    * leaving it in diverges across engines (Spark's array_join renders an
    * all-NULL session as '' where SQL string_agg yields NULL) — the
    * untyped row also shouldn't silently extend a session's gap chain. */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, tokCol: String, gapSeconds: Long, k: Int): DataFrame = {
    val se = Sessionize.withSessionSeq(
      events.filter(col(userCol).isNotNull && col(tokCol).isNotNull),
      userCol, tsCol, idCol, gapSeconds)
    se.groupBy(col(userCol), col("session_seq"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(tsCol), col(idCol),
            col(tokCol).as("tok")))),
          x => x.getField("tok")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** DuckDB mirror of [[transitions]] over `FROM (srcSql) src` with
    * columns (g, ts, id, tok). Emits CTE `seq_trans`. */
  def sqlTransitionsCtes(srcSql: String): String = s"""seq_next AS (
      SELECT tok AS from_tok,
        lead(tok) OVER (PARTITION BY g ORDER BY ts, id) AS to_tok
      FROM ($srcSql) AS src),
    seq_cnt AS (
      SELECT from_tok, to_tok, count(*) AS n
      FROM seq_next WHERE to_tok IS NOT NULL
      GROUP BY 1, 2),
    seq_trans AS (
      SELECT from_tok, to_tok, n,
        CAST(sum(n) OVER (PARTITION BY from_tok) AS BIGINT) AS n_from,
        round(CAST(n AS DOUBLE)
          / CAST(sum(n) OVER (PARTITION BY from_tok) AS DOUBLE), 8) AS p
      FROM seq_cnt)"""
}
