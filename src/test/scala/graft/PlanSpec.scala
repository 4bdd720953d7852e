package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SortExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Structural audits of the PHYSICAL plans the catalog produces — the
  * scale contract made executable. Correctness gates prove the numbers;
  * these prove the SHAPE that survives a 1000-executor cluster: filters
  * reaching the parquet scan, projections pruning the read schema,
  * dimensions broadcast, and — catalog-wide — no unpartitioned
  * Cartesian product ever slipping in (the one operator that cannot be
  * saved by more machines).
  */
class PlanSpec extends SparkSpec {

  // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
  // root whose children only materialize at execution, so collect()
  // would see nothing
  private def plan(name: String) =
    Queries.queries(name)(spark, sf()).queryExecution.sparkPlan

  test("q03: filter is pushed into the parquet scan, schema is pruned") {
    val scans = plan("q03_filtered_revenue").collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val li = scans.find(_.metadata.get("Location").exists(
      _.contains("lineitem"))).getOrElse(scans.head)
    val pushed = li.metadata.getOrElse("PushedFilters", "[]")
    assert(pushed != "[]", s"no pushed filters on the lineitem scan: $pushed")
    // the scan must NOT read all 11 lineitem columns for this projection
    assert(li.requiredSchema.fields.length < 11,
      s"unpruned read schema: ${li.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q02: star-schema dimensions join via broadcast, not shuffle") {
    val p = plan("q02_revenue_by_nation").toString
    assert(p.contains("BroadcastHashJoin"),
      "expected the nation/region dimensions to broadcast")
  }

  test("q253: native top-k plans as a partial hash aggregate, not a window sort") {
    val p = plan("q253_topk_native").toString
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_graft_topk"),
      s"expected a map-side partial graft_topk aggregate:\n$p")
    assert(!p.contains("Window"),
      "the native top-k must not fall back to a window sort")
  }

  test("q269: the isin filter prunes hive partitions at planning time") {
    val df = Queries.queries("q269_partition_pruning")(spark, sf())
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.metadata.get("Location")
        .exists(_.contains("part_orders_")) => f
    }
    assert(scans.nonEmpty, "expected a scan over the partitioned dir")
    val pf = scans.head.metadata.getOrElse("PartitionFilters", "[]")
    assert(pf.contains("o_orderpriority"),
      s"partition filter not pushed to the directory listing: $pf")
  }

  // Streaming queries execute on build (bounded runs), so they are
  // exercised by their own gate instead of planned here. The set lives
  // in main source (shared with Bench's pre-timing audit).
  private val streamingSkip = graft.plans.GlobalWindows.streamingBoundedRuns

  // Plan the whole catalog ONCE; all catalog-wide audits walk this.
  // clearCache first: suites run sequentially in one JVM, and a cache
  // entry a PRIOR suite registered (Dataset.persist is plan-keyed in the
  // shared CacheManager) would splice an InMemoryTableScan into any
  // structurally-matching subplan here, perturbing the fingerprints
  // below depending on suite order. With a clean cache, the only cache
  // nodes are the ones the catalog's own builds register — in fixed
  // catalog order, hence deterministic.
  // Builds (and their side effects: cache registration, staged writes,
  // localCheckpoints) all run here, in fixed catalog order, BEFORE any
  // plan phase is accessed — so every query's withCachedData sees the
  // same final cache state no matter which audit test runs first.
  private lazy val catalogQEs: Seq[(String, QueryExecution)] = {
    spark.catalog.clearCache()
    Queries.all.map(_._1).filterNot(streamingSkip)
      .map(n => (n, Queries.queries(n)(spark, sf()).queryExecution))
  }
  private lazy val catalogPlans: Seq[(String, SparkPlan)] =
    catalogQEs.map { case (n, qe) => (n, qe.sparkPlan) }

  test("catalog-wide: physical-plan fingerprints match the pinned fixture") {
    // The scale contract, pinned per query: join strategy, exchange
    // count, global-vs-partitioned sorts/windows, aggregate modes, and
    // per-scan (table, pruned-schema width, filter pushdown). A benign
    // refactor keeps these invariant; a broadcast degrading to
    // sort-merge, a lost pushdown, or a new shuffle fails here with a
    // one-line diff — at test time, not as a bench riser two rounds
    // later. Regenerate consciously after an INTENDED plan change:
    //   GRAFT_UPDATE_FINGERPRINTS=1 sbt "testOnly graft.PlanSpec -- -z fingerprint"
    // and review the fixture diff like code.
    val path = java.nio.file.Paths.get("src/test/resources/plan_fingerprints.txt")
    // executedPlan, not sparkPlan: exchanges exist only after
    // EnsureRequirements, and shuffle count is the headline signal
    val actual = catalogQEs
      .map { case (n, qe) => s"$n ${graft.plans.PlanFingerprint.of(qe.executedPlan)}" }
    if (sys.env.contains("GRAFT_UPDATE_FINGERPRINTS")) {
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, actual.mkString("", "\n", "\n"))
      info(s"fingerprint fixture rewritten: ${actual.length} queries")
    } else {
      assert(java.nio.file.Files.exists(path),
        s"missing fixture $path — run with GRAFT_UPDATE_FINGERPRINTS=1 once")
      val pinned = java.nio.file.Files.readAllLines(path).asScala
        .filter(_.nonEmpty).toSeq
      val pinnedMap = pinned.map(l => l.span(_ != ' ')).toMap
      val actualMap = actual.map(l => l.span(_ != ' ')).toMap
      val drift = actual.filter { l =>
        val (n, fp) = l.span(_ != ' ')
        pinnedMap.get(n).exists(_ != fp)
      }.map { l =>
        val (n, _) = l.span(_ != ' ')
        s"  pinned: $n${pinnedMap(n)}\n  actual: $l"
      }
      val missing = pinnedMap.keySet -- actualMap.keySet
      val added = actualMap.keySet -- pinnedMap.keySet
      assert(drift.isEmpty && missing.isEmpty && added.isEmpty,
        s"plan fingerprint drift (${drift.size} changed, ${missing.size} gone, " +
          s"${added.size} new — review, then regenerate with " +
          "GRAFT_UPDATE_FINGERPRINTS=1 if intended):\n" +
          (drift ++ missing.map("  gone: " + _) ++ added.map("  new: " + _))
            .mkString("\n"))
    }
  }

  test("catalog-wide: no unpartitioned CartesianProduct in any query plan") {
    // BroadcastNestedLoopJoin over a broadcast one-row frame is the
    // catalog's deliberate scalar-distribution idiom and is fine; a
    // CartesianProductExec (both sides partitioned, full n×m) is the
    // shape that can never be saved by more executors.
    val offenders = catalogPlans.collect {
      case (name, p) if p.collect { case c: CartesianProductExec => c }.nonEmpty
        => name
    }
    assert(offenders.isEmpty,
      s"CartesianProduct found in: ${offenders.mkString(", ")}")
  }

  test("catalog-wide: every unpartitioned WindowExec runs on a documented bounded frame") {
    // `Window.orderBy` with no partition key moves ALL its input to one
    // partition — acceptable ONLY on a frame whose size is bounded by
    // something scale-independent (post-aggregation months, digit
    // groups, bucket totals…). COVERAGE.md's audit table documents each
    // such site; this test keeps the audit from rotting: any NEW query
    // that plans a global window must consciously join this allowlist
    // (and the COVERAGE.md table) or fail here.
    // The allowlist lives in MAIN source (graft.plans.GlobalWindows) so
    // Bench can assert/silence against the same set; each entry carries
    // its bounded-frame justification there (mirrored in COVERAGE.md).
    // Asserted as set EQUALITY, both directions: a NEW global window must
    // consciously join the allowlist, and a STALE allowlist entry whose
    // query no longer plans a global window must leave it.
    val allowed = graft.plans.GlobalWindows.allowed.keySet
    val planned = catalogPlans.collect {
      case (name, p) if p.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.nonEmpty => name
    }.toSet
    val undocumented = planned -- allowed
    assert(undocumented.isEmpty,
      s"undocumented global window in: ${undocumented.mkString(", ")}")
    val stale = (allowed -- planned).filterNot(streamingSkip)
    assert(stale.isEmpty,
      "stale GlobalWindows.allowed entries (no global window planned): " +
        stale.mkString(", "))
  }

  test("ScaleGuard rejects unpartitioned windows over raw rows, allows bounded frames") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{col, count, lit, row_number, sum}
    import graft.plans.ScaleGuard
    val o = Queries.table(spark, sf(), "orders")
    // the q246 failure class: a global rank over every raw row
    val bad = o.withColumn("rk",
      row_number().over(W.orderBy(col("o_totalprice"))))
    intercept[ScaleGuard.UnscalablePlanException] {
      ScaleGuard.assertScalable(bad)
    }
    // bounded: the global window sits on a post-aggregation frame
    val bounded = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(W.orderBy(col("o_orderpriority"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)))
    ScaleGuard.assertScalable(bounded)
    // partitioned windows over raw rows are the normal, scalable shape
    val partitioned = o.withColumn("rk", row_number().over(
      W.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))))
    ScaleGuard.assertScalable(partitioned)
    // driver-local literal frames (rank spines, lookup tables) are safe
    import spark.implicits._
    val local = Seq(1, 2, 3).toDF("i").withColumn("rk",
      row_number().over(W.orderBy(col("i"))))
    ScaleGuard.assertScalable(local)
    // condition-free raw×raw join = full Cartesian product: rejected
    val li = Queries.table(spark, sf(), "lineitem")
    intercept[ScaleGuard.UnscalablePlanException] {
      ScaleGuard.assertScalable(o.crossJoin(li))
    }
    // the catalog's scalar-distribution idiom — crossJoin against a
    // one-row aggregate — is a collapsed side and passes
    ScaleGuard.assertScalable(
      o.crossJoin(li.agg(count(lit(1)).as("n"))))
  }

  test("the INJECTED check rule (Verify/Bench session shape) fires on an unscalable canary") {
    // Verify and Bench run with spark.graft.scaleGuard=true on a session
    // built withExtensions(new GraftExtensions); this proves that exact
    // wiring rejects an unscalable plan at ANALYSIS time — not just the
    // imperative assertScalable path the test above exercises. newSession()
    // inherits the extensions (and therefore the injected check rule) but
    // has its own conf, so flipping the flag here cannot race the other
    // suites sharing the main session.
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{col, row_number}
    import graft.plans.ScaleGuard
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.scaleGuard", "true")
    val o = graft.sources.Tables.load(s2, sf(), "orders")
    // Dataset construction analyzes EAGERLY (Dataset.ofRows calls
    // assertAnalyzed), so the guard fires inside withColumn itself
    intercept[ScaleGuard.UnscalablePlanException] {
      o.withColumn("rk",
        row_number().over(W.orderBy(col("o_totalprice")))).select(col("rk"))
    }
    // same plan, guard off (the default) — analyzes fine
    val o0 = Queries.table(spark, sf(), "orders")
    o0.withColumn("rk", row_number().over(W.orderBy(col("o_totalprice"))))
      .select(col("rk")).queryExecution.assertAnalyzed()
    // and a healthy using-join on the GUARDED session analyzes fine (the
    // transient root-join artifact of Dataset.join(_, Seq(...)) must not
    // trip the rule)
    val c2 = graft.sources.Tables.load(s2, sf(), "customer")
    o.withColumn("c_custkey", col("o_custkey"))
      .join(c2, Seq("c_custkey")).queryExecution.assertAnalyzed()
  }

  test("the injected FaultInject rule fires on first attempts; off by default") {
    // taskretry invariance-row wiring (tools/invariance.sh row m): the
    // conf-gated queryStagePrep rule wraps every parquet scan with a
    // first-attempt throw. The test context is local[4] — maxFailures
    // pinned to 1 — so the injected fault fails the job outright, which
    // proves the fault actually fires inside the scan stage; the
    // retry-SUCCEEDS half of the contract is the invariance row itself,
    // run on a local[4,4] master. newSession(): own conf, shared context.
    val s2 = spark.newSession()
    s2.conf.set(graft.plans.FaultInject.CONF, "true")
    val o = graft.sources.Tables.load(s2, sf(), "orders")
    val e = intercept[Exception] { o.count() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("graft-fault-inject")),
      s"expected the injected fault in the failure chain: ${chain(e)}")
    // default session (conf unset): plans stay wrapper-free
    val plain = Queries.table(spark, sf(), "orders")
    assert(plain.count() > 0)
    assert(!plain.queryExecution.executedPlan.exists(
      _.isInstanceOf[graft.plans.FaultInjectExec]))
  }

  test("ScaleGuard rejects unbounded streaming dedup state, allows watermark-evicted forms") {
    // The streaming face of the scale contract: plain dropDuplicates on a
    // stream evicts state ONLY for keys carrying the watermark metadata —
    // a watermark elsewhere in the plan does not bound it. Guarded
    // session (same shape as Verify/Bench); rate source gives a streaming
    // frame with (timestamp, value) and no files to stage.
    import graft.plans.ScaleGuard
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.scaleGuard", "true")
    def rate = s2.readStream.format("rate").load()
    // no watermark at all: one state row per distinct key, forever
    intercept[ScaleGuard.UnscalablePlanException] {
      rate.dropDuplicates("value")
    }
    // watermark present but NOT among the dedup keys: still unbounded —
    // this is the trap the check exists for
    intercept[ScaleGuard.UnscalablePlanException] {
      rate.withWatermark("timestamp", "1 hour").dropDuplicates("value")
    }
    // event-time column among the keys: state evicts on watermark — passes
    rate.withWatermark("timestamp", "1 hour")
      .dropDuplicates("value", "timestamp")
      .queryExecution.assertAnalyzed()
    // dropDuplicatesWithinWatermark: watermark-evicted by construction
    rate.withWatermark("timestamp", "1 hour")
      .dropDuplicatesWithinWatermark("value")
      .queryExecution.assertAnalyzed()
    // batch dropDuplicates is untouched by the streaming rule
    Queries.table(s2, sf(), "orders").dropDuplicates("o_custkey")
      .queryExecution.assertAnalyzed()
  }

  test("q269: the partition column is NOT read from parquet data pages") {
    // partitionBy layout contract, negative half: o_orderpriority comes
    // back from directory names at listing time — a requiredSchema that
    // includes it would mean the column was ALSO materialized in the
    // data files, doubling its storage and defeating pruning.
    val scans = plan("q269_partition_pruning").collect {
      case f: FileSourceScanExec if f.metadata.get("Location")
        .exists(_.contains("part_orders_")) => f
    }
    assert(scans.nonEmpty, "expected a scan over the partitioned dir")
    val dataCols = scans.head.requiredSchema.fieldNames.toSet
    assert(!dataCols.contains("o_orderpriority"),
      s"partition column read from data pages: ${dataCols.mkString(",")}")
    assert(dataCols.contains("o_totalprice"), "data column missing from read")
  }

  test("q265: selection never globally sorts pre-aggregation rows") {
    // Negative half of the two-phase selection contract: the ONLY sort
    // allowed to see row-level data is the in-bucket TakeOrdered
    // refinement (bounded by one bucket's rows). A global SortExec whose
    // subtree reaches a scan with no intervening aggregate/limit is the
    // ORDER BY ... OFFSET shape the operator exists to replace. The
    // internal jobs run during build, so capture executed plans via a
    // listener (delivery is async — poll for the 3 refinement jobs).
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = captured.add(qe.executedPlan)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    // expand adaptive wrappers: AdaptiveSparkPlanExec and QueryStageExec
    // are leaves to TreeNode traversal, so plain collect() sees nothing
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec        => nodes(q.plan)
      case o                        => o.children.flatMap(nodes)
    })
    def reachesRawScan(p: SparkPlan): Boolean = p match {
      case _ if p.nodeName.contains("Aggregate") ||
        p.nodeName.contains("Limit") ||
        p.nodeName.contains("TakeOrdered") => false
      case _: FileSourceScanExec => true
      // driver-local result frames (the 3-row stats output) are not data
      case _ if p.nodeName.contains("LocalTableScan") => false
      case _ if p.nodeName.contains("Scan") => true // RDD/checkpoint scans
      case a: AdaptiveSparkPlanExec => reachesRawScan(a.executedPlan)
      case q: QueryStageExec        => reachesRawScan(q.plan)
      case o => o.children.exists(reachesRawScan)
    }
    spark.listenerManager.register(listener)
    try {
      Queries.queries("q265_order_statistics")(spark, sf()).collect()
      val deadline = System.currentTimeMillis() + 20000
      def allNodes = captured.asScala.toSeq.flatMap(nodes)
      // 3 stats -> 3 in-bucket TakeOrdered refinement jobs
      while (System.currentTimeMillis() < deadline &&
          allNodes.count(_.isInstanceOf[TakeOrderedAndProjectExec]) < 3)
        Thread.sleep(100)
      val ns = allNodes
      assert(ns.count(_.isInstanceOf[TakeOrderedAndProjectExec]) >= 3,
        "expected one TakeOrdered refinement per requested stat")
      val offending = ns.collect {
        case s: SortExec if s.global && reachesRawScan(s.child) => s
      }
      assert(offending.isEmpty,
        s"global sort over raw rows:\n${offending.mkString("\n")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("simhash banding is NULL-skew-proof: planted NULL-doc blocks add " +
      "linear row volume, never a k²/2 candidate bucket") {
    // The 100 TB hazard: contentless docs sketch to NULL (q29's
    // contract); an unguarded band groupBy pools every NULL sketch into
    // ONE bucket per band, whose pair expansion emits k²/2 doomed
    // candidates for k NULL docs. The guard filters NULL sketches before
    // banding. Proof by executed metrics: total row volume across the
    // whole physical plan must grow LINEARLY in the planted-NULL count —
    // at k = 800 an unguarded bucket expansion alone is ≥ 4·k²/2 ≈ 1.3M
    // rows, while the guarded plan adds ~a handful of rows per NULL doc.
    import spark.implicits._
    import graft.operators.NearDup
    def corpus(k: Int): org.apache.spark.sql.DataFrame = {
      val real = (0L until 100L).map {
        case i if i % 10 == 9 => // planted dup of the previous doc
          (i, s"alpha beta gamma doc${i - 1} delta epsilon zeta eta theta")
        case i => (i, s"alpha beta gamma doc$i delta epsilon zeta eta theta")
      }
      val nulls = (100000L until 100000L + k).map(i => (i, null: String))
      (real ++ nulls).toDF("doc_id", "text")
    }
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec        => nodes(q.plan)
      case o                        => o.children.flatMap(nodes)
    })
    def rowVolume(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val n = df.count()
      val v = nodes(df.queryExecution.executedPlan)
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
      (v, n)
    }
    val emptySk = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      graft.streaming.DedupIngest.sketchSchema)
    val paths: Seq[(String, Int => org.apache.spark.sql.DataFrame)] = Seq(
      ("simhash60", k => NearDup.simhashNearDupPairs(corpus(k), "doc_id", "text", 3)),
      ("simhash128", k => NearDup.simhash128NearDupPairs(corpus(k), "doc_id", "text", 3)),
      ("delta-dd", k => NearDup.deltaSimhash128Pairs(emptySk, corpus(k), "doc_id", "text", 3)))
    for ((name, mk) <- paths) {
      val (v0, n0) = rowVolume(mk(0))
      assert(n0 > 0, s"$name: fixture must produce pairs for the test to bite")
      val (v400, n400) = rowVolume(mk(400))
      val (v800, n800) = rowVolume(mk(800))
      assert(n400 == n0 && n800 == n0,
        s"$name: NULL docs changed the pair output ($n0 / $n400 / $n800)")
      // linear bound: ≤ 40 plan rows per planted NULL doc (observed ~6;
      // the unguarded quadratic bucket is ≥ 800 rows/doc at k = 800)
      assert(v800 - v400 <= 400L * 40,
        s"$name: super-linear row volume on planted NULLs " +
          s"(k=400 → $v400 rows, k=800 → $v800 rows)")
      assert(v800 <= v0 + 800L * 40,
        s"$name: NULL docs cost ${v800 - v0} plan rows over the clean run")
    }
  }

  test("q329: the Hill tail takes its order statistics without ANY sort") {
    // The estimator's scale claim: top-100 spends come from the
    // graft_topk heap aggregate (a partial hash agg), so the plan must
    // contain no SortExec and no window at all — the final output is a
    // single aggregated row, and every join is a broadcast of a bounded
    // frame. If a refactor reintroduces row_number()/ORDER BY for the
    // order statistics, this fails.
    val p = plan("q329_hill_tail_index")
    val sorts = p.collect { case s: SortExec => s }
    assert(sorts.isEmpty, s"SortExec found:\n${sorts.mkString("\n")}")
    val topkAggs = p.collect {
      case a if a.nodeName.contains("ObjectHashAggregate") => a
    }
    assert(topkAggs.nonEmpty,
      "expected the TypedImperativeAggregate top-k (ObjectHashAggregate)")
  }
}
