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
}
