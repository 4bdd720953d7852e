package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event log: a new session starts when
  * the gap to the previous event of the same user exceeds `gapSeconds`.
  *
  * Classic lag + conditional cumulative-sum formulation: two window passes
  * over the same (user, time) ordering, so Spark sorts each user partition
  * once and reuses it. Scales with the number of events per user, not total
  * events; skewed users are bounded by per-user data volume.
  *
  * Gaps are compared in integer microseconds (`unix_micros`) — never in
  * floating seconds — so engine-independent and deterministic.
  */
object Sessionize {

  /** Events annotated with their `session_seq` (1-based per user) — the
    * per-event view, for funnel/attribution analyses that need columns
    * beyond the session envelope. */
  def withSessionSeq(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val gapMicros = gapSeconds * 1000000L
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(order))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("prev_ts")) > gapMicros, 1)
        .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_sess")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_sess")
  }

  def sessions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame =
    withSessionSeq(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .orderBy(col(userCol), col("session_seq"))
}
