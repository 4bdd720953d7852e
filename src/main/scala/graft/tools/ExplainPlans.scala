package graft.tools

import org.apache.spark.sql.SparkSession

/** Offline plan audit: print the join / exchange / codegen skeleton of
  * catalog queries (args = query names; default: a recent-additions set).
  * The skeleton is what the 100 TB review reads — a CartesianProduct or
  * an unexpected SinglePartition exchange shows up here long before it
  * shows up as a melted cluster. */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q144_jaro_winkler_pairs", "q145_oov_rate",
        "q146_multitouch_attribution", "q147_containment_pairs",
        "q148_benford_audit", "q149_autocorrelation")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)
    for (n <- names) {
      println(s"=== $n ===")
      val plan = graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      println(plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") ||
          l.contains("Cartesian") || l.contains("Window") ||
          l.contains("WholeStageCodegen")).mkString("\n"))
    }
    spark.stop()
  }
}
