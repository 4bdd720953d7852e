package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Data-layout guarantees: a co-bucketed equi-join and a bucket-key
  * aggregation plan with zero shuffle exchanges, and partition-pruned
  * scans under a partitionBy directory layout.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy layout prunes the scan to matching partitions only") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
      .toString + "/orders_by_year"
    // the 100 TB ingest layout: one directory per coarse key (here
    // order-year); readers filtering on it must never open other dirs
    orders.withColumn("o_year", year($"o_orderdate"))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val part = spark.read.parquet(dir)
    val q = part.filter($"o_year" === 1996)
    val scan = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, s"no partition filters: $scan")
    // orders span 7 order-years -> exactly one partition directory survives
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scan.selectedPartitions.partitionCount}")
    // pruned read agrees with the unpartitioned filter row-for-row
    val expected = orders.filter(year($"o_orderdate") === 1996).count()
    assert(expected > 0 && q.count() == expected)
  }

  test("co-bucketed join and bucket-key aggregation plan with no shuffle") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val customer = spark.read.parquet(s"${sf()}/customer.parquet")
    // disable auto-broadcast so the sort-merge path (the 100 TB shape,
    // where neither side broadcasts) is what gets planned and compared
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(orders, "orders_bkt", "o_custkey", 8)
      Bucketing.writeBucketed(customer, "customer_bkt", "c_custkey", 8)
      val o = spark.table("orders_bkt")
      val c = spark.table("customer_bkt")

      val joined = o.join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      // the unbucketed plan needs at least one exchange for the join...
      val unbucketed = orders.join(customer, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      assert(Bucketing.shuffleExchangeCount(unbucketed) >= 1)
      // ...the co-bucketed one joins shuffle-free (only the final
      // mktsegment agg exchanges, on the already-joined, reduced data)
      val joinOnly = o.join(c, $"o_custkey" === $"c_custkey")
      assert(Bucketing.shuffleExchangeCount(joinOnly) == 0,
        joinOnly.queryExecution.sparkPlan.toString)

      // aggregation keyed on the bucket column: no exchange at all
      val agg = o.groupBy($"o_custkey").agg(sum($"o_totalprice"))
      assert(Bucketing.shuffleExchangeCount(agg) == 0,
        agg.queryExecution.sparkPlan.toString)

      // and the results match the unbucketed computation
      val a = joined.orderBy("c_mktsegment").collect().toSeq
      val b = unbucketed.orderBy("c_mktsegment").collect().toSeq
      assert(a == b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Bucketing.dropTable(spark, "orders_bkt")
      Bucketing.dropTable(spark, "customer_bkt")
    }
  }
}
