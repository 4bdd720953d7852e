package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.BoundedRuns

/** Scratch calibration: dump the three bounded streaming results at a
  * given SF so the oracle emission predicates can be pinned against
  * DuckDB (strict vs non-strict watermark comparisons). */
object CalibrateStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1)
      else graft.sources.Artifacts.path("target/graft/calib")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    BoundedRuns.upsertEndState(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/upsert")
    BoundedRuns.emittedSessions(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/sessions")
    BoundedRuns.emittedHourly(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/hourly")
    spark.stop()
  }
}
