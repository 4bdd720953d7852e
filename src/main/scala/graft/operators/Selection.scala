package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics WITHOUT a global sort — the
  * two-phase selection pattern (bucket histogram, then in-bucket
  * refinement) that replaces `ORDER BY val LIMIT 1 OFFSET k-1` at scale:
  * a full sort shuffles the entire table through one total order, while
  * this runs one hash aggregation over bucket ids plus one bounded
  * top-(k') job inside the single bucket that contains the target rank.
  *
  * Determinism: the k-th order STATISTIC (the value at rank k under any
  * ascending order) is well-defined even with duplicate values, so no
  * tiebreak is needed anywhere — which is what makes the operator
  * hash-checkable against a `row_number() OVER (ORDER BY val)` oracle.
  *
  * Driver state is the bucket histogram — bounded by
  * (value range / bucketWidth), a deliberate operator parameter: choose
  * a width that keeps the histogram in the thousands of rows (for
  * o_totalprice, width 1000 → ~600 buckets at any SF, since TPC-H price
  * bounds are scale-independent). The in-bucket refinement sorts only
  * one bucket's rows (~n/buckets), never the table.
  */
object Selection {

  /** Values at the given ranks of `valueCol` ascending (NULLs dropped,
    * like SQL ordering aggregates). `stats` maps a label to the target
    * rank as a function of the non-null row count n (1-based). Returns
    * (stat, k, value) sorted by stat. */
  def orderStatistics(df: DataFrame, valueCol: String,
      stats: Seq[(String, Long => Long)], bucketWidth: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("b", floor(col("v") / lit(bucketWidth)).cast("long"))
      .localCheckpoint() // referenced once per stat below (GraphCore rule)

    val hist = vals.groupBy(col("b")).agg(count(lit(1)).as("c"))
      .orderBy(col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    if (n == 0) {
      vals.unpersist()
      throw new IllegalArgumentException(
        s"orderStatistics: no non-null values in column '$valueCol'")
    }

    val rows =
      try stats.map { case (name, rankOf) =>
        val k = rankOf(n)
        require(k >= 1 && k <= n,
          s"orderStatistics: stat '$name' requests rank $k outside [1, $n]")
        // walk the bounded histogram to the bucket holding rank k
        var cum = 0L
        var i = 0
        while (cum + hist(i)._2 < k) { cum += hist(i)._2; i += 1 }
        val (bucket, _) = hist(i)
        val kIn = (k - cum).toInt
        val value = vals.filter(col("b") === lit(bucket))
          .orderBy(col("v")).limit(kIn)
          .agg(max(col("v"))).collect()(0).getDouble(0)
        (name, k, value)
      }
      finally vals.unpersist() // checkpointed blocks outlive the call otherwise
    rows.toDF("stat", "k", "value")
  }
}
