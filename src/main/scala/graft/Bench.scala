package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (Queries.benchNames) against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line the driver parses.
  *
  * Each query is fully materialized through the `noop` sink (all partitions
  * computed, nothing collected to the driver), which measures engine
  * throughput rather than driver serialization. One untimed warmup absorbs
  * JVM/classloader/codegen startup so the numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      Queries.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = Queries.benchNames
    // warmup: run the first two headline queries untimed
    names.take(2).foreach(run)

    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { run(name); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // a failed query must not masquerade as a (fast) success — mark it
      // with -1 so any consumer of the JSON sees the failure
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    // failed queries (-1 markers) must not subtract from the headline total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
