package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (Queries.benchNames) against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (stdout's last line) the
  * driver parses.
  *
  * Each query is fully materialized through the `noop` sink (all partitions
  * computed, nothing collected to the driver), which measures engine
  * throughput rather than driver serialization. Each query runs
  * SPARK_GRAFT_BENCH_ITERS times (default 3) and reports the MIN — the
  * least-noise estimator for a shared machine (background load only ever
  * adds time); the first iteration doubles as the per-query codegen/JIT
  * warmup, and a global warmup absorbs JVM/classloader startup.
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
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    require(iters > 0,
      s"SPARK_GRAFT_BENCH_ITERS must be positive, got $iters — zero would " +
        "report Double.MaxValue as a 'successful' timing for every query")
    // global warmup: one query untimed (JVM/classloader/parquet-footer
    // startup); per-query codegen warmup is covered by min-of-iters
    names.take(1).foreach(run)

    val results = names.map { name =>
      var best = Double.MaxValue
      var failed = false
      var i = 0
      while (i < iters && !failed) {
        val t0 = System.nanoTime()
        try {
          run(name)
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed = true
        }
        i += 1
      }
      // a failed query must not masquerade as a (fast) success — mark it
      // with -1 so any consumer of the JSON sees the failure
      name -> (if (failed) -1.0 else best)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    // failed queries (-1 markers) must not subtract from the headline total
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stop FIRST so the JSON is guaranteed to be stdout's last line
    spark.stop()
    println(json)
  }
}
