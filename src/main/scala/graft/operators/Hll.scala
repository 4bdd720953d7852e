package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable HyperLogLog distinct-count sketches (Flajolet et al. '07) —
  * the at-scale replacement for `count(DISTINCT …)`.
  *
  * An exact distinct count shuffles every key; at 100 TB that is often the
  * single most expensive exchange in a profiling pass. The HLL register
  * table here is a few hundred bytes per group, built with one map-side
  * combinable aggregation, and — the property that matters operationally —
  * **mergeable**: sketches built per day / per partition / per cluster
  * combine by a plain `MAX` per register, so a year of daily sketches
  * rolls up without ever touching the raw keys again ([[merge]] is
  * associative and idempotent by construction).
  *
  * Everything is deterministic and cross-engine portable, which is what
  * makes an *approximate* operator oracle-checkable exactly:
  *  - the hash is the portable md5-derived 60-bit value
  *    ([[TextHash.md5Bits60]]), not an engine-private hash;
  *  - register index = low `p` bits; rank ρ = leading-zero count of the
  *    remaining `60-p` bits + 1, computed with integer bit-length (no
  *    floats);
  *  - the harmonic mean's register sum Σ 2^−M_j is kept EXACT by scaling
  *    to integers: Σ 2^(53−M_j) as a BIGINT (≤ m·2^53 = 2^61 at p = 8 —
  *    no overflow, no float-combine-order dependence);
  *  - the final estimate is one double expression over those integers,
  *    identical operation-for-operation in the SQL mirror; the linear-
  *    counting branch (the one `ln`) is snapped to 4 decimals.
  *
  * Scale shape: sketch build is a single hash aggregation keyed on
  * (group, register) — at most m rows per group survive the map-side
  * combine, so the shuffle is bounded by #groups·m regardless of corpus
  * size. Estimation reduces m rows per group to one.
  */
object Hll {

  /** Register count exponent: m = 2^p registers. p = 8 keeps the scaled
    * harmonic sum within BIGINT (m·2^53 = 2^61) and the standard error
    * ~1.04/√m ≈ 6.5%. Raising p beyond 10 would overflow the exact
    * integer sum — fail loudly rather than silently switch to floats. */
  val P = 8
  val M: Int = 1 << P
  private val W = 60 - P          // suffix width feeding ρ
  private val Scale = 1L << (W + 1) // 2^53: exact-integer scaling of 2^-M_j

  /** Register index expression for a key column — reusable wherever the
    * grouping differs (batch groups, streaming event-time windows). */
  def regCol(key: Column): Column =
    TextHash.md5Bits60(key.cast("string")).bitwiseAND(lit((M - 1).toLong))

  /** Rank ρ expression for a key column (leading-zero count of the
    * post-index hash bits + 1, via integer bit-length — no floats). */
  def rhoCol(key: Column): Column = {
    val suffix = shiftright(TextHash.md5Bits60(key.cast("string")), P)
    when(suffix === 0L, lit(W + 1))
      .otherwise(lit(W + 1) - length(bin(suffix)))
  }

  /** Per-group HLL registers for a key column: one row per (group,
    * register) holding the max rank ρ. Duplicate keys collapse in the
    * max — no pre-distinct pass needed. */
  def sketch(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame =
    df.select(groupCols.map(col) :+ regCol(col(keyCol)).as("reg") :+
        rhoCol(col(keyCol)).as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("reg"): _*)
      .agg(max(col("rho")).as("rho"))

  /** Merge two register tables (e.g. yesterday's rollup + today's batch):
    * union + per-register MAX. Associative, commutative, idempotent —
    * sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)) exactly. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("reg"): _*)
      .agg(max(col("rho")).as("rho"))

  /** Collapse a register table to one row per group: occupied/zero register
    * counts, the exact scaled harmonic sum, and the HLL estimate (with the
    * standard small-range linear-counting correction, snapped to 4
    * decimals — the `ln` is the only non-integer step). */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("occupied"),
        sum(call_function("shiftright", lit(Scale), col("rho").cast("int")))
          .cast("long").as("s_occ"))
    val zeros = lit(M.toLong) - col("occupied")
    val sScaled = col("s_occ") + zeros * lit(Scale)
    // alpha_m * m^2 * 2^53 / S — op order mirrored exactly in sqlEstimate.
    val estRaw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(9007199254740992.0) / sScaled.cast("double")
    val est = when(estRaw <= lit(2.5 * M) && zeros > 0L,
        lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double")))
      .otherwise(estRaw)
    agg
      .withColumn("zeros", zeros)
      .withColumn("s_scaled", sScaled)
      .withColumn("hll_est", round(est, 4))
      .drop("s_occ")
  }

  /** DuckDB mirror of [[sketch]]+[[estimate]] as CTE bodies over a source
    * relation: `FROM (srcSql) AS src` with columns (g, key). Emits CTEs
    * `hll_regs` (g, reg, rho) and `hll_est` (g, occupied, zeros, s_scaled,
    * hll_est). */
  def sqlSketchCtes(srcSql: String): String = {
    val h = TextHash.sqlMd5Bits60("CAST(key AS VARCHAR)")
    s"""hll_h AS (
      SELECT g, $h AS h FROM ($srcSql) AS src),
    hll_regs AS (
      SELECT g, (h & ${M - 1}) AS reg,
        max(CASE WHEN (h >> $P) = 0 THEN ${W + 1}
                 ELSE ${W + 1} - length(format('{:b}', h >> $P)) END) AS rho
      FROM hll_h GROUP BY g, (h & ${M - 1})),
    hll_agg AS (
      SELECT g, CAST(count(*) AS BIGINT) AS occupied,
        CAST(sum($Scale >> rho) AS BIGINT) AS s_occ
      FROM hll_regs GROUP BY g),
    hll_est AS (
      SELECT g, occupied, ($M - occupied) AS zeros,
        s_occ + ($M - occupied) * $Scale AS s_scaled,
        round(CASE
          WHEN 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0
               / CAST(s_occ + ($M - occupied) * $Scale AS DOUBLE) <= ${2.5 * M}
           AND ($M - occupied) > 0
          THEN ${M.toDouble} * ln(${M.toDouble} / CAST($M - occupied AS DOUBLE))
          ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0
               / CAST(s_occ + ($M - occupied) * $Scale AS DOUBLE)
        END, 4) AS hll_est
      FROM hll_agg)"""
  }
}
