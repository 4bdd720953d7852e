package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Stable.dec

/** Incremental aggregate maintenance: keep a per-key ALGEBRAIC state
  * (count, exact-decimal sum, min, max) and fold each new delta batch into
  * it — the pattern that turns "re-aggregate 100 TB nightly" into
  * "aggregate today's slice and merge", because algebraic states compose:
  * merge(state(A), state(B)) = state(A ∪ B) by construction (the same
  * property Spark's own partial aggregation exploits within one query,
  * lifted across runs; cf. Gray et al., Data Cube, ICDE '96 — these are
  * the distributive aggregates).
  *
  * The sum is carried in exact DECIMAL while it remains state (the
  * [[graft.functions.Stable]] discipline): a double sum would make the
  * merged total depend on batch arrival order. Finalize (round → double)
  * only when publishing.
  *
  * Scale shape: `aggState` is one hash aggregation of the delta only;
  * `merge` is a full-outer join of two state tables, each keyed and
  * already small (one row per key). Avg derives as sum/n downstream;
  * non-algebraic measures (exact medians) are out of scope by design —
  * that is what sketches (describeApprox) are for.
  */
object Incremental {

  /** Per-key state of `valCol`: (keys, st_n, st_sum DECIMAL, st_min,
    * st_max). NULL measures count for nothing, like SQL aggregates. */
  def aggState(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(col(valCol)).as("st_n"),
        sum(dec(col(valCol))).as("st_sum"),
        min(col(valCol)).as("st_min"),
        max(col(valCol)).as("st_max"))

  /** state(A) ⊕ state(B): full-outer on the keys — a key present in only
    * one side keeps its state verbatim (coalesce for the additive parts;
    * `least`/`greatest` already skip NULL operands). */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val stateCols = Seq("st_n", "st_sum", "st_min", "st_max")
    require(stateCols.forall(a.columns.contains) &&
      stateCols.forall(b.columns.contains),
      "merge expects two aggState frames")
    val bb = stateCols.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"d_$c"))
    a.join(bb, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("st_n"), lit(0L)) + coalesce(col("d_st_n"), lit(0L)))
          .as("st_n"),
        // both-NULL stays NULL (SQL: sum over zero non-null values), so a
        // merged state is indistinguishable from the full recompute
        when(col("st_sum").isNull && col("d_st_sum").isNull,
            lit(null).cast(a.schema("st_sum").dataType))
          .otherwise((coalesce(col("st_sum"), dec(lit(0)))
              + coalesce(col("d_st_sum"), dec(lit(0))))
            .cast(a.schema("st_sum").dataType))
          .as("st_sum"),
        least(col("st_min"), col("d_st_min")).as("st_min"),
        greatest(col("st_max"), col("d_st_max")).as("st_max")): _*)
  }
}
