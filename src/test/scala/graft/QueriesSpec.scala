package graft

import org.apache.spark.sql.functions._

/** Smoke + sanity for every catalog query at sf0.001: runs, non-empty
  * (where statistically guaranteed), key invariants hold. The exact-value
  * gate is the driver's DuckDB compare (tools/compare.py locally). */
class QueriesSpec extends SparkSpec {

  private val dir = sf()

  test("every catalog query runs and returns rows at sf0.001") {
    Queries.all.foreach { case (name, q) =>
      val df = q.build(spark, dir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle or a documented reason not to") {
    val missing = Queries.all.collect {
      case (n, q) if q.oracle.isEmpty && q.whyNoOracle.isEmpty => n
    }
    assert(missing.isEmpty, s"queries without oracle or documented reason: $missing")
  }

  test("entry flagship returns nation-level revenue") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet ==
      Set("r_name", "n_name", "revenue", "n_orders", "n_custs"))
    assert(df.count() == 25)
  }

  test("q01 aggregates are exact-decimal stable (repartition-invariant)") {
    val a = Queries.queries("q01_pricing_summary")(spark, dir).collect()
    // same query over a differently-partitioned input must give identical
    // doubles — the core guarantee of Stable's decimal aggregation
    val li = spark.read.parquet(s"$dir/lineitem.parquet").repartition(13)
    li.createOrReplaceTempView("lineitem_re")
    val b = Queries.queries("q01_pricing_summary")(spark, dir).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("q09 topk is deterministic and sorted") {
    val rows = Queries.queries("q09_topk_orders")(spark, dir).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(2))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q22 dedup keeps one id per distinct text") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val distinctTexts = docs.select(countDistinct(col("text"))).first().getLong(0)
    val kept = Queries.queries("q22_exact_dedup_keep_first")(spark, dir).count()
    assert(kept == distinctTexts)
  }

  test("q25 knn returns k neighbors per query, self excluded") {
    val rows = Queries.queries("q25_knn_bruteforce")(spark, dir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 20)
    assert(byQuery.values.forall(_.length == 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }
}
