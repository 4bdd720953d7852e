package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-query contract: a session serving several catalog queries
  * AT ONCE must produce exactly the serial answers. Verify/Bench sweep the
  * catalog serially, so nothing else exercises the multi-tenant shape a
  * shared production session actually runs — interleaved job scheduling,
  * concurrent operator-internal persist/unpersist on the session-global
  * plan-keyed CacheManager, and parallel analysis through the injected
  * ScaleGuard rule. The mix below deliberately spans the risky operator
  * classes: iterative loops with their own cache lifecycle (components,
  * PageRank with localCheckpoint), self-join dedup with ReusedExchange
  * (prefix-jaccard, containment), a custom TypedImperativeAggregate
  * (graft_topk), and plain relational aggregation.
  */
class ConcurrencySpec extends SparkSpec {

  private val names = Seq(
    "q01_pricing_summary",    // relational agg
    "q08_brand_revenue",      // broadcast join + exact-decimal agg
    "q29_simhash",            // custom hash expressions
    "q52_dup_components",     // iterative loop, persists + convergence counts
    "q88_prefix_jaccard_pairs", // inverted-index self-join, persists
    "q120_pagerank",          // iterative loop, persist + localCheckpoint
    "q147_containment_pairs", // ReusedExchange self-join
    "q253_topk_native")       // graft_topk ObjectHashAggregate

  /** Canonical row-set form: sorted full-precision row strings. The
    * catalog's determinism contract means serial and concurrent runs must
    * match EXACTLY, not approximately. */
  private def canon(name: String): String =
    Queries.queries(name)(spark, sf())
      .collect().map(_.toString).sorted.mkString("\n")

  private def sweepCaches(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  test("eight diverse catalog queries running concurrently match their serial results exactly") {
    val serial = names.map(n => n -> canon(n)).toMap
    sweepCaches()
    val pool = ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(names.size))
    try {
      implicit val ec: ExecutionContext = pool
      val concurrent = Await.result(
        Future.sequence(names.map(n => Future(n -> canon(n)))),
        10.minutes).toMap
      for (n <- names)
        assert(concurrent(n) == serial(n),
          s"$n diverged between serial and concurrent execution")
    } finally { pool.shutdown(); sweepCaches() }
  }

  test("the same persist-heavy query run twice concurrently matches serial (shared plan-keyed cache)") {
    // The dangerous case: two in-flight invocations of ONE query build
    // structurally-equal frames, so the second persist call attaches to
    // the FIRST invocation's CacheManager entry, and the first to finish
    // unpersists it while the other is mid-loop. Correctness must not
    // depend on who wins — a lost cache may recompute, never miscompute.
    // q52's components loop (persist-per-round + convergence counts) is
    // the heaviest cache churner in the catalog.
    val expect = canon("q52_dup_components")
    sweepCaches()
    val pool = ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(2))
    try {
      implicit val ec: ExecutionContext = pool
      val both = Await.result(
        Future.sequence(Seq.fill(2)(
          Future(canon("q52_dup_components")))),
        10.minutes)
      assert(both.forall(_ == expect),
        "concurrent same-query runs diverged from the serial result")
    } finally { pool.shutdown(); sweepCaches() }
  }

  for ((provName, provClass) <- Seq(
    "default provider" ->
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "RocksDB provider" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
  test("concurrent snapshot readers against a LIVE compacting ingest " +
      s"stream only ever see committed snapshots ($provName)") {
    // The production shape the r12 GC-horizon watch item was about:
    // downstream batch jobs reading dedup state WHILE the single-writer
    // ingest loop appends and compacts. Under r12's zero-horizon GC a
    // reader that resolved a manifest just before a compaction could
    // have its named dirs deleted mid-read (FileNotFound). With the
    // [[graft.streaming.ManifestTable.GC_HORIZON]] retention window,
    // every read must (a) never throw and (b) observe exactly a
    // committed per-batch snapshot — state counts on batch boundaries,
    // survivor counts in the prefix-count set (admission is monotone in
    // doc_id, so every committed prefix count is derivable one-shot).
    import org.apache.spark.sql.functions.col
    import graft.streaming.DedupIngest
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val w = Files.createTempDirectory("graft-concread-").toString
    // 40 docs, planted dup chains so survivors < docs
    def text(i: Long): String =
      if (i == 12) text(3) else if (i == 21) text(12)
      else if (i == 15) text(14) else s"w$i x$i y$i z$i v$i"
    def docs(ids: Seq[Long]) = ids.map(i => (i, text(i))).toDF("doc_id", "text")
    val slices = (0L until 40L).grouped(4).toSeq // 10 batches of 4
    // one-shot reference → the committed-prefix observation sets
    val ref = Files.createTempDirectory("graft-concread-ref-").toString
    DedupIngest.initSimhash128State(spark, s"$ref/state")
    DedupIngest.simhash128IngestBatch(docs(0L until 40L), 0,
      s"$ref/state", s"$ref/surv", "doc_id", "text")
    val oneShot = DedupIngest.readSurvivors(spark, s"$ref/surv")
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
    val validState = (0 to 10).map(k => 4L * k).toSet
    val validSurv = (0 to 10).map(k => oneShot.count(_ < 4L * k).toLong).toSet
    // stage the slices as an mtime-ordered file-source stream
    val base = System.currentTimeMillis()
    Files.createDirectories(Paths.get(s"$w/stage"))
    slices.zipWithIndex.foreach { case (ids, b) =>
      val tmp = s"$w/slice$b"
      docs(ids).coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = Paths.get(s"$w/stage/part$b.parquet")
      Files.move(f.toPath, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(base + b * 10000L))
    }
    DedupIngest.initSimhash128State(spark, s"$w/state")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var done = false
    val reader = new Thread(() => {
      while (!done) {
        try {
          val sc = DedupIngest.readState(spark, s"$w/state").count()
          if (!validState.contains(sc)) bad.add(s"state=$sc")
          try {
            val vc = DedupIngest.readSurvivors(spark, s"$w/surv").count()
            if (!validSurv.contains(vc)) bad.add(s"surv=$vc")
          } catch {
            // before the survivor sink's very first commit the table
            // legitimately has no manifest — not a race, skip
            case e: RuntimeException if e.getMessage != null &&
              e.getMessage.contains("no manifest") => ()
          }
        } catch { case t: Throwable => errs.add(t); done = true }
      }
    }, "graft-concurrent-reader")
    reader.start()
    try {
      val sess = spark.newSession()
      sess.conf.set("spark.sql.streaming.stateStore.providerClass", provClass)
      val q = DedupIngest.simhash128IngestSink(
          sess.readStream.schema(docs(Seq(0L)).schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$w/stage"),
          s"$w/state", s"$w/surv", "doc_id", "text", compactEvery = 2)
        .option("checkpointLocation", s"$w/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally { done = true; reader.join(30000) }
    assert(errs.isEmpty, s"reader threw mid-stream: ${errs.peek()}")
    assert(bad.isEmpty, s"uncommitted observation(s): ${bad.peek()}")
    val finalSurv = DedupIngest.readSurvivors(spark, s"$w/surv")
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(finalSurv == oneShot, "streamed survivors diverged from one-shot")
  }
}
