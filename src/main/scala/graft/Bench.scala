package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries (Queries.benchNames) against
  * SPARK_GRAFT_SF_DIR and prints ONE COMPACT JSON line (stdout's last
  * line, qNN-prefixed query keys, < 1900 chars — the driver only records
  * a ~2 KB stdout tail, and an oversized line gets cut mid-JSON and
  * fails to parse, which is exactly what happened to BENCH_r01-r05). The
  * VERBOSE artifact (full query names, per-query medians, the
  * full-catalog tier) goes to `target/bench.json` — sbt prefixes stdout
  * with `[info] `, which defeats line-oriented JSON parsing anyway, so
  * file is the canonical rich record.
  *
  * Each query is fully materialized through the `noop` sink (all partitions
  * computed, nothing collected to the driver), which measures engine
  * throughput rather than driver serialization. Each query runs
  * SPARK_GRAFT_BENCH_ITERS times (default 5) and reports BOTH the MIN (the
  * least-noise estimator for a shared machine — background load only ever
  * adds time) and the MEDIAN (`queries_median`) — r5's judge found
  * loop-heavy queries swinging 2-3x across idle runs, which makes
  * round-over-round movement unfalsifiable from a single statistic; the
  * pair bounds the noise envelope per query in one artifact. The first
  * iteration doubles as the per-query codegen/JIT warmup, and a global
  * warmup absorbs JVM/classloader startup. The bench JVM pins Xms=Xmx and
  * ParallelGC (build.sbt) for the same reason.
  *
  * A second tier times the FULL catalog, one iteration each, at sf0.01
  * (`queries_all` in the JSON) so regressions in queries outside the
  * headline set are still caught round-over-round. Opt out with
  * SPARK_GRAFT_BENCH_ALL=0; point it elsewhere with
  * SPARK_GRAFT_BENCH_ALL_DIR.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      // same scale gate as Verify: analysis-time ScaleGuard on every
      // benched plan (see plans/ScaleGuard.scala)
      .withExtensions(new GraftExtensions)
      .config("spark.graft.scaleGuard", "true")
      // see Verify: SPARK_GRAFT_STATESTORE=rocksdb opts the streaming
      // queries onto the RocksDB state store
      .config("spark.sql.streaming.stateStore.providerClass",
        if (sys.env.get("SPARK_GRAFT_STATESTORE").contains("rocksdb"))
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // same rationale as Verify: never emit legacy INT96 timestamps
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Measured shuffle discipline: cumulative task metrics, snapshotted
    // around each timed run; per-query DELTAS (shuffle r/w bytes, spill,
    // scan input bytes/records) land in target/bench.json as
    // `queries_metrics` / `queries_all_metrics`, so a broadcast join
    // silently degrading to a shuffle, a scan losing column pruning, or
    // a map-side combine stopping combining is a visible round-over-round
    // number, not a wall-clock guess (see tools/TaskMetricsListener).
    val taskMetrics = new graft.tools.TaskMetricsListener
    spark.sparkContext.addSparkListener(taskMetrics)

    def run(name: String, dir: String): Unit = {
      Queries.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      // operators that persist internally (components' label frame, the
      // embedding-dedup base) pin executor storage per invocation; free it
      // between runs so a multi-query timing loop measures each query
      // cold-cache and storage stays flat across the whole bench.
      // TWO layers, both required (r8 — the task-metric telemetry caught
      // iterations 2+ of every Dataset.persist-using query running with
      // ZERO scan input): Dataset.persist registers in the session
      // CacheManager keyed by LOGICAL PLAN, so (a) an RDD-level unpersist
      // never evicts it and (b) the next iteration's structurally-equal
      // plan silently reuses the warm cached copy ("Asked to cache
      // already cached data" was the symptom flooding every prior bench
      // log). clearCache() evicts the plan-level entries; the RDD sweep
      // still covers localCheckpoint lineage, which clearCache ignores.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // per query: (min, median, last-iteration task-metric deltas) over
    // iters; a failed query must not masquerade as a (fast) success —
    // marked (-1, -1) so any consumer of the JSON sees the failure.
    // Metrics come from the LAST iteration (the deltas are plan-
    // deterministic — same shuffle/scan volume every run — so any
    // settled iteration is representative); the settle wait runs OUTSIDE
    // the timed window.
    case class Timing(min: Double, median: Double, metrics: Map[String, Long],
        iters: Seq[Double])
    def timeTier(names: Seq[String], dir: String, iters: Int): Seq[(String, Timing)] =
      names.map { name =>
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        var failed = false
        var i = 0
        var lastMetrics = Map.empty[String, Long]
        while (i < iters && !failed) {
          // settled (bus-drained) baseline: after a failed query (whose
          // catch path never settles) or any late listener drain,
          // straggler task events from the PREVIOUS query would land
          // inside this query's delta. The settle wait runs outside the
          // timed window.
          val before = taskMetrics.settledSnapshot()
          val t0 = System.nanoTime()
          try {
            run(name, dir)
            times += (System.nanoTime() - t0) / 1e9
            lastMetrics = taskMetrics.delta(before, taskMetrics.settledSnapshot())
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            failed = true
          }
          i += 1
        }
        if (failed) name -> Timing(-1.0, -1.0, Map.empty, Seq.empty)
        else {
          val s = times.sorted
          val med =
            if (s.length % 2 == 1) s(s.length / 2)
            else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
          name -> Timing(s.head, med, lastMetrics, times.toSeq)
        }
      }

    def toJsonObj(results: Seq[(String, Double)]): String =
      results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}")
    def metricsJson(r: Seq[(String, Timing)]): String =
      r.map { case (k, t) =>
        "\"" + k + "\":" + t.metrics.toSeq.sortBy(_._1)
          .map { case (f, v) => "\"" + f + "\":" + v }
          .mkString("{", ",", "}")
      }.mkString("{", ",", "}")
    def mins(r: Seq[(String, Timing)]): Seq[(String, Double)] =
      r.map { case (k, t) => k -> t.min }
    def medians(r: Seq[(String, Timing)]): Seq[(String, Double)] =
      r.map { case (k, t) => k -> t.median }
    def itersJson(r: Seq[(String, Timing)]): String =
      r.map { case (k, t) =>
        "\"" + k + "\":" + t.iters.map(v => f"$v%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    // Load telemetry (r8 judge ask #6): the r8 headline read needed
    // bench_history archaeology to adjudicate a loaded driver box
    // (min/median spread 1.66x vs 1.22x idle). Record the OS 1-minute
    // load average around the run and the per-iteration raw times, so a
    // loaded-box artifact is machine-identifiable: spread = value_median
    // / value; on an idle box it sits near 1.0-1.2, and load averages
    // far above the core count mean minutes are contended.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage

    // SPARK_GRAFT_BENCH_ONLY=q52,q28 restricts the timed tier to a
    // prefix-matched subset of the WHOLE catalog (headline names are a
    // subset, so headline selectors behave as before) — the isolation
    // harness for separating catalog-size effects (codegen cache,
    // classloading) from box noise, and for idle-box re-measurement of
    // non-headline queries (r6 ask: q142/q162 min+median).
    val only: Option[Seq[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    // SPARK_GRAFT_BENCH_STRESS=only times the STRESS tier instead of the
    // headline tier (q30's deliberate no-prune regime — r12 ask #4: its
    // variance drowned the decade signal of the other headline queries,
    // so it pins as its own artifact, bench_idle_*_stress.json)
    val names = only match {
      case Some(sel) => Queries.all.map(_._1).filter(n => sel.exists(n.startsWith))
      case None =>
        if (sys.env.get("SPARK_GRAFT_BENCH_STRESS").contains("only"))
          Queries.stressNames
        else Queries.benchNames
    }
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    require(iters > 0,
      s"SPARK_GRAFT_BENCH_ITERS must be positive, got $iters — zero would " +
        "report Double.MaxValue as a 'successful' timing for every query")

    // Global-window discipline, enforced at bench time (not just in
    // PlanSpec): plan every query to be timed OUTSIDE the timed loop and
    // assert that exactly the queries in plans.GlobalWindows.allowed
    // contain an unpartitioned WindowExec. Only then is it legitimate to
    // silence WindowExec's "No Partition Defined" warning, whose ~40-line
    // flood buried real signals in every prior round's bench log — any
    // query outside the allowlist that grows a global window fails here
    // loudly instead of warning quietly.
    locally {
      import org.apache.spark.sql.execution.window.WindowExec
      // streaming bounded-run queries are skipped here for the same
      // reason PlanSpec skips them: building one RUNS the stream (so the
      // audit would execute every stream before timing even starts), and
      // its df is the post-run batch frame, not the streaming plan
      val planned = names
        .filterNot(graft.plans.GlobalWindows.streamingBoundedRuns)
        .filter { name =>
        Queries.queries(name)(spark, sfDir).queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.nonEmpty
      }.toSet
      val undocumented = planned -- graft.plans.GlobalWindows.allowed.keySet
      require(undocumented.isEmpty,
        s"global window outside plans.GlobalWindows.allowed: $undocumented")
      // (subset, not equality: the headline tier needn't contain every
      // allowlisted query — PlanSpec asserts full set equality catalog-
      // wide. Streaming bounded-run entries execute on build; free any
      // frames they persisted before timing starts.)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        classOf[WindowExec].getName, org.apache.logging.log4j.Level.ERROR)
    }
    // global warmup: one query untimed (JVM/classloader/parquet-footer
    // startup); per-query codegen warmup is covered by min-of-iters. A
    // broken first query must not kill the whole bench — timeTier will
    // re-surface the failure as that query's -1 marker.
    try names.take(1).foreach(run(_, sfDir))
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    // drain warmup's (and the window audit's) task events so the first
    // timed query's metric delta starts from a settled baseline
    taskMetrics.settledSnapshot()

    val loadStart = loadAvg()
    val results = timeTier(names, sfDir, iters)
    val loadEnd = loadAvg()
    // failed queries (-1 markers) must not subtract from the headline total
    val total = mins(results).map(_._2).filter(_ >= 0).sum
    val totalMedian = medians(results).map(_._2).filter(_ >= 0).sum

    // full-catalog tier: every query once at sf0.01 — a regression tripwire
    // for the ~50 queries outside the headline set
    val allTier =
      if (sys.env.getOrElse("SPARK_GRAFT_BENCH_ALL", "1") == "0") ""
      else {
        val allDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_ALL_DIR",
          "/root/testdata/sf0.01")
        val allResults = timeTier(Queries.all.map(_._1), allDir, 1)
        val allTotal = mins(allResults).map(_._2).filter(_ >= 0).sum
        f""","queries_all":${toJsonObj(mins(allResults))},"queries_all_total":$allTotal%.3f,"queries_all_sf":"$allDir","queries_all_metrics":${metricsJson(allResults)}"""
      }

    val spread = if (total > 0) totalMedian / total else -1.0
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${toJsonObj(mins(results))},"queries_median":${toJsonObj(medians(results))},"queries_metrics":${metricsJson(results)},"queries_iters":${itersJson(results)},"value_median":$totalMedian%.3f,"spread":$spread%.3f,"load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f,"cpus":"$cpus","iters":$iters,"sf":"$sfDir"$allTier}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), json + "\n")
    // Timestamped archive copy: bench.json is overwritten by EVERY run
    // (including single-query probes), which has already cost one round a
    // full-tier artifact mid-analysis. History lives outside git; prune by
    // hand. tools/metrics_diff.py takes any two of these.
    val hist = java.nio.file.Paths.get("target/bench_history")
    java.nio.file.Files.createDirectories(hist)
    val stamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd-HHmmss").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())
    java.nio.file.Files.writeString(
      hist.resolve(s"bench-$stamp.json"), json + "\n")
    // STDOUT gets a COMPACT line instead of the verbose artifact above:
    // the driver records only a ~2000-char tail of stdout and parses the
    // JSON line out of it — five rounds of BENCH_r*.json carry
    // "parsed": null because the full line (per-query maps × 200+
    // queries ≈ 15 KB) was always cut mid-line by that window. Query
    // keys are shortened to their qNN prefix and the median/all-catalog
    // tiers live only in target/bench.json (recorded in COVERAGE.md).
    val shortMins = mins(results).map { case (k, v) =>
      k.takeWhile(_ != '_') -> v }
    var compact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${toJsonObj(shortMins)},"value_median":$totalMedian%.3f,"spread":$spread%.3f,"load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f,"cpus":"$cpus","iters":$iters,"sf":"$sfDir"}"""
    if (compact.length > 1900) // defensive: totals survive even if the
      compact =                // headline set outgrows the tail window
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","value_median":$totalMedian%.3f,"spread":$spread%.3f,"load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f,"cpus":"$cpus","iters":$iters,"sf":"$sfDir"}"""
    // stop FIRST so the JSON is guaranteed to be stdout's last line
    spark.stop()
    println(compact)
  }
}
