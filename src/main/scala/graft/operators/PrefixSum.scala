package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running totals and ranks over a GLOBAL order — without the
  * single-partition window Spark plans for `Window.orderBy(...)` with no
  * partition key (the classic scalability cliff of running-share /
  * percent-of-total queries: one executor sorts the world).
  *
  * Standard two-pass prefix-sum, made deterministic:
  *  1. bucket rows by exact type-7 quantile thresholds of the ordering
  *     key ([[Binning]] machinery — a pure function of the DATA, unlike
  *     `repartitionByRange`'s RNG sampling, so re-runs and retries see
  *     identical buckets);
  *  2. run the window WITHIN each bucket (parallel across buckets, state
  *     bounded by bucket size);
  *  3. shift each bucket by the exclusive running total of the buckets
  *     before it in scan order — computed on the BOUNDED (nBuckets-row)
  *     totals frame and broadcast back.
  *
  * Values accumulate in exact decimal, so bucket-local sums + offsets
  * compose associatively to exactly the global-window answer —
  * OperatorsSpec pins equality against the naive formulation.
  */
object PrefixSum {

  /** Adds `rnk` (1-based position) and `cum` (inclusive running
    * decimal(18,2) sum of `valCol`) in (`sortCol`, `tieCol` ASC) order —
    * `sortCol` descending when `descending` (running-share shape),
    * ascending otherwise (rank-weighted shape). `tieCol` must be unique
    * per row (it makes the order total). */
  def running(df: DataFrame, sortCol: String, tieCol: String,
      valCol: String, descending: Boolean,
      nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val th = Binning.quantileThresholds(
      df.select(col(sortCol).cast("double").as("v")), "v",
      math.max(nBuckets, 2))
    // bucket 0 holds the FIRST values of the scan order. Boundary ties
    // share a bucket (strict > below), so bucket order never splits an
    // equivalence class across the offset boundary incorrectly —
    // within-bucket ordering handles them.
    val asc = Binning.binIndex(col(sortCol).cast("double"), th)
    val bucket = if (descending) lit(th.length) - asc else asc
    val ord: Seq[Column] =
      Seq(if (descending) col(sortCol).desc else col(sortCol).asc,
        col(tieCol))
    val bucketed = df.withColumn("__b", bucket)
    val w = Window.partitionBy(col("__b")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("__lc", sum(col(valCol).cast("decimal(18,2)")).over(w)
        .cast("decimal(20,2)"))
      .withColumn("__lr", row_number().over(
        Window.partitionBy(col("__b")).orderBy(ord: _*)))
    val totals = bucketed.groupBy(col("__b"))
      .agg(sum(col(valCol).cast("decimal(18,2)")).cast("decimal(20,2)")
        .as("__t"), count(lit(1)).as("__n"))
    // exclusive offsets over the bounded totals frame: a global window
    // here is fine — it sees nBuckets rows, not the data
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff),
        lit(0).cast("decimal(20,2)")))
      .withColumn("__roff", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"), col("__roff"))
    local.join(broadcast(offsets), "__b")
      .withColumn("cum", (col("__off") + col("__lc")).cast("decimal(20,2)"))
      .withColumn("rnk", col("__roff") + col("__lr"))
      .drop("__b", "__lc", "__lr", "__off", "__roff")
  }

  /** Adds `cum` (inclusive running LONG sum of `valCol`) in `orderCol`
    * ASC order — the integer twin of [[running]] for token budgets and
    * row counts. `orderCol` must be unique per row (it makes the order
    * total; it is also the bucketing key, so its double cast only needs
    * to respect the order — boundary ties share a bucket and the
    * within-bucket sort refines them exactly). Long addition is
    * associative, so bucket-local sums + broadcast offsets compose to
    * exactly the single-partition-window answer. */
  def runningLong(df: DataFrame, orderCol: String, valCol: String,
      nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val th = Binning.quantileThresholds(
      df.select(col(orderCol).cast("double").as("v")), "v",
      math.max(nBuckets, 2))
    val bucketed = df.withColumn("__b",
      Binning.binIndex(col(orderCol).cast("double"), th))
    val w = Window.partitionBy(col("__b")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("__lc", sum(col(valCol).cast("long")).over(w))
    val totals = bucketed.groupBy(col("__b"))
      .agg(sum(col(valCol).cast("long")).as("__t"))
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    local.join(broadcast(offsets), "__b")
      .withColumn("cum", col("__off") + col("__lc"))
      .drop("__b", "__lc", "__off")
  }

  /** Adds, for each name in `cols`, a `p_<name>` column holding that
    * column's value on the PREVIOUS row in global `orderCol` ASC order —
    * `lag(c) OVER (ORDER BY orderCol)` without the single-partition
    * window: the same deterministic quantile-bucket scheme as
    * [[running]] computes the lag within each bucket, and each bucket's
    * FIRST row is patched from the previous bucket's last row via a
    * broadcast join on the bounded (nBuckets-row) boundary frame.
    * `orderCol` must be numeric, unique and non-null (it makes the order
    * total; uniqueness also means no cross-bucket ties, so bucket order
    * refines to exactly the global order). `p_*` is NULL on the global
    * first row only — NOT on key gaps, which is the point: a k+1
    * self-equi-join counts a key GAP as a missing predecessor, while
    * this operator (like the sorted lag it replaces) pairs every row
    * with its true scan predecessor. (q315's engine-vs-oracle run-count
    * divergence at the r10 sf1 step — 9 copy-boundary key gaps — was
    * exactly that confusion.) */
  def withGlobalLag(df: DataFrame, orderCol: String, cols: Seq[String],
      nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val th = Binning.quantileThresholds(
      df.select(col(orderCol).cast("double").as("v")), "v",
      math.max(nBuckets, 2))
    val bucketed = df.withColumn("__b",
      Binning.binIndex(col(orderCol).cast("double"), th))
    val wLag = Window.partitionBy(col("__b")).orderBy(col(orderCol))
    val lagged = cols.foldLeft(
        bucketed.withColumn("__rn", row_number().over(wLag))) {
      (d, c) => d.withColumn(s"p_$c", lag(col(c), 1).over(wLag))
    }
    // bounded boundary frame: each bucket's LAST row's attributes, keyed
    // to the NEXT bucket (bucket ids from binIndex are dense 0..n-1, so
    // the successor is a plain +1 join — no window over the frame)
    val lastRows = bucketed.groupBy(col("__b"))
      .agg(max_by(struct(cols.map(col): _*), col(orderCol)).as("__last"))
      .select((col("__b") + 1).as("__b"), col("__last"))
    lagged.join(broadcast(lastRows), Seq("__b"), "left")
      .select(
        lagged.columns.filterNot(c => c == "__rn" || c.startsWith("p_") ||
          c == "__b").map(col) ++
        cols.map(c => when(col("__rn") === 1, col(s"__last.$c"))
          .otherwise(col(s"p_$c")).as(s"p_$c")): _*)
  }
}
