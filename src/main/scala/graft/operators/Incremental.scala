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
    * `least`/`greatest` already skip NULL operands).
    *
    * Key joins are NULL-SAFE (`<=>`): [[aggState]]'s groupBy puts all
    * NULL-key rows in ONE group, so the state algebra must treat NULL
    * keys as equal too — with plain `=` a NULL-key group would never
    * merge with (or retract from) its own state row, silently breaking
    * merge(state(A), state(B)) = state(A ∪ B) on raw data with
    * unattributed keys. */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    val stateCols = Seq("st_n", "st_sum", "st_min", "st_max")
    require(stateCols.forall(a.columns.contains) &&
      stateCols.forall(b.columns.contains),
      "merge expects two aggState frames")
    val bb = (stateCols ++ keyCols).foldLeft(b)((df, c) =>
      df.withColumnRenamed(c, s"d_$c"))
    val cond = keyCols.map(k => col(k) <=> col(s"d_$k")).reduce(_ && _)
    a.join(bb, cond, "full_outer")
      .select(keyCols.map(k => coalesce(col(k), col(s"d_$k")).as(k)) ++ Seq(
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

  /** state(base) ⊖ deletes — RETRACTION, the other half of incremental
    * view maintenance (GDPR erasure, late-arriving corrections). Count
    * and sum subtract exactly (they are group-homomorphic); min/max are
    * NOT retractable — the state cannot tell whether a deleted row WAS
    * the extremum — so they are recomputed from `survivors`, but ONLY
    * for the touched keys (left-semi pruned recount): maintenance cost
    * stays proportional to the affected slice, never the table. A key
    * whose rows are all deleted disappears, so the result is
    * INDISTINGUISHABLE from `aggState(survivors)` — the contract the
    * q277 oracle and the unit test pin.
    *
    * `survivors` must be base ∖ deletes (the caller owns row identity —
    * typically an anti-join on the row id). */
  def retract(state: DataFrame, deletes: DataFrame, survivors: DataFrame,
      keyCols: Seq[String], valCol: String): DataFrame = {
    // all key joins null-safe, same reason as in [[merge]]
    val del = aggState(deletes, keyCols, valCol)
    val touched = keyCols.foldLeft(del.select(keyCols.map(col): _*))(
      (df, k) => df.withColumnRenamed(k, s"t_$k"))
    val semiCond = keyCols.map(k => col(k) <=> col(s"t_$k")).reduce(_ && _)
    val rec0 = aggState(
        survivors.join(touched, semiCond, "left_semi"), keyCols, valCol)
      .select(keyCols.map(col) ++ Seq(lit(true).as("r_present"),
        col("st_min").as("r_min"), col("st_max").as("r_max")): _*)
    val rec = keyCols.foldLeft(rec0)((df, k) =>
      df.withColumnRenamed(k, s"r_$k"))
    val dd = (Seq("st_n", "st_sum", "st_min", "st_max") ++ keyCols)
      .foldLeft(del)((df, c) => df.withColumnRenamed(c, s"d_$c"))
    val sumType = state.schema("st_sum").dataType
    val newN = col("st_n") - coalesce(col("d_st_n"), lit(0L))
    val dCond = keyCols.map(k => col(k) <=> col(s"d_$k")).reduce(_ && _)
    val rCond = keyCols.map(k => col(k) <=> col(s"r_$k")).reduce(_ && _)
    state.join(dd, dCond, "left").join(rec, rCond, "left")
      .withColumn("touched", col("d_st_n").isNotNull)
      // a touched key survives iff the pruned recount saw it (this also
      // keeps NULL-measure-only keys, which st_n — a non-null count —
      // cannot distinguish from fully-deleted ones)
      .filter(!col("touched") || col("r_present"))
      .select(keyCols.map(col) ++ Seq(
        newN.as("st_n"),
        // zero surviving non-null measures -> NULL sum, exactly like a
        // fresh aggregate over the survivors
        when(newN === 0L, lit(null).cast(sumType))
          .otherwise((col("st_sum") - coalesce(col("d_st_sum"),
            dec(lit(0)))).cast(sumType)).as("st_sum"),
        when(col("touched"), col("r_min")).otherwise(col("st_min"))
          .as("st_min"),
        when(col("touched"), col("r_max")).otherwise(col("st_max"))
          .as("st_max")): _*)
  }
}
