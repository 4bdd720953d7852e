package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic-arithmetic helpers shared by every query in the catalog.
  *
  * The correctness gate hash-compares Spark output against a DuckDB oracle
  * running "the same" SQL. Floating-point aggregation is order-dependent, and
  * at 100 TB the partitioning (and therefore the combine order) is never the
  * same twice — so any `sum(double)` is unreproducible *by construction*,
  * across engines and even across runs of the same engine.
  *
  * The fix used throughout: aggregate in exact DECIMAL (Spark widens the
  * accumulator precision automatically, so this scales), round on the
  * decimal, and cast to double only at the very end. Both engines convert the
  * same exact decimal to the same IEEE double, so results are bit-identical
  * and partitioning-independent. Decimal widths are kept narrow enough that
  * neither engine ever hits its 38-digit precision cliff (Spark would
  * silently round under `allowPrecisionLoss`, DuckDB would overflow).
  *
  * Reference behaviors covered: the money arithmetic of the loan pipeline
  * (`Total_Income` derivation, app.py:50,59) and all profiling aggregates
  * (SURVEY.md §2.4).
  */
object Stable {

  /** Exact 2-decimal money representation: enough for prices < 10^10. */
  def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** Narrow 2-decimal representation for rates (discount/tax) and small
    * quantities; keeps product precision well inside 38 digits. */
  def rate(c: Column): Column = c.cast("decimal(4,2)")

  private def one: Column = lit(1).cast("decimal(3,2)")

  /** TRUE iff `c` is a finite (non-NULL, non-NaN, non-±Inf) double — the
    * metric-observation predicate of the statistical operators: a corrupt
    * telemetry double is not an observation, and letting it through
    * either crashes an exact-decimal cast (oracle side) or silently
    * skews n-vs-sum bookkeeping. NULL input yields NULL (filtered). */
  def finite(c: Column): Column =
    !isnan(c) && abs(c) =!= lit(Double.PositiveInfinity)

  /** Finalize an exact decimal aggregate as a stable double. */
  def m2(c: Column): Column = round(c, 2).cast("double")

  /** Order-independent sum of a money column. */
  def msum(c: Column): Column = m2(sum(dec(c)))

  /** Deterministic mean: stable-double numerator / exact count of FINITE
    * observations. A plain `avg(double)` would be combine-order-dependent;
    * and counting with `count(c)` would tally NaN/±Inf rows that the
    * exact-decimal numerator maps to NULL (double→DECIMAL cast), diluting
    * the mean — the n-vs-sum bookkeeping skew [[finite]]'s doc warns
    * about. Numerator and denominator see the same observation set. */
  def mavg(c: Column): Column = msum(c) / count(when(finite(c), lit(1)))

  /** `price * (1 - discount)`, exact: decimal(12,2) * decimal(5,2). */
  def revenue(price: Column, discount: Column): Column =
    dec(price) * (one - rate(discount))

  /** `price * (1 - discount) * (1 + tax)`, exact to 6 decimals. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    revenue(price, discount) * (one + rate(tax))

  /** Order-independent mean of an arbitrary double expression in [-10^4,
    * 10^4]: each value is snapped to 8 exact decimals, summed exactly, then
    * divided as a double. Used for similarity scores. */
  def davg(c: Column): Column =
    round(sum(c.cast("decimal(14,8)")), 6).cast("double") / count(lit(1))

  /** 6-decimal exact snap for generic measure values (|v| < 10^12) — wide
    * enough for every numeric column in the star schema, narrow enough
    * that v·v (decimal(37,12)) and its sum stay inside 38 digits. */
  private def d6(c: Column): Column = c.cast("decimal(18,6)")

  /** Order-independent sum of a generic measure (finalized at 4 decimals). */
  def dsum(c: Column): Column = round(sum(d6(c)), 4).cast("double")

  /** Order-independent sum of squares of a generic measure — the second
    * moment for spread statistics, exact in decimal until the final snap. */
  def dsumsq(c: Column): Column = round(sum(d6(c) * d6(c)), 4).cast("double")

  // --- DuckDB-side mirrors -------------------------------------------------
  // Oracle SQL fragments computing the *identical* exact-decimal pipeline.
  //
  // Non-finite metric contract: Spark's double→DECIMAL cast maps NaN/±Inf
  // to NULL, so a corrupt metric contributes nothing to an exact-decimal
  // aggregate and an all-corrupt group aggregates to NULL. DuckDB's cast
  // THROWS instead — every raw-double entry point below guards with
  // isfinite so the oracle states the same semantics the engine has.

  /** `expr` with non-finite doubles mapped to NULL — the SQL mirror of
    * Spark's double→DECIMAL cast behavior on NaN/±Inf. Spelled with
    * isnan + an Infinity compare (NOT DuckDB's isfinite): these helpers
    * are DUAL-DIALECT — some catalog queries run them through
    * `spark.sql`, where isfinite does not exist. */
  def sqlFinite(expr: String): String =
    s"(CASE WHEN isnan($expr) OR abs($expr) = CAST('Infinity' AS DOUBLE) " +
      s"THEN NULL ELSE $expr END)"

  /** DuckDB mirror of [[msum]]. */
  def sqlMsum(col: String): String =
    s"CAST(round(sum(CAST(${sqlFinite(col)} AS DECIMAL(12,2))),2) AS DOUBLE)"

  /** DuckDB mirror of [[mavg]] — the denominator counts the finite-mapped
    * expression (NULL for NaN/±Inf), matching the engine's finite-only
    * observation count. */
  def sqlMavg(col: String): String =
    s"${sqlMsum(col)} / count(${sqlFinite(col)})"

  /** DuckDB mirror of [[revenue]] (un-aggregated). */
  def sqlRevenue(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST($discount AS DECIMAL(4,2)))"

  /** DuckDB mirror of [[charge]] (un-aggregated). */
  def sqlCharge(price: String, discount: String, tax: String): String =
    s"${sqlRevenue(price, discount)} * (CAST(1 AS DECIMAL(3,2)) + CAST($tax AS DECIMAL(4,2)))"

  /** DuckDB mirror of `m2(sum(expr))` for an exact-decimal expr. */
  def sqlM2Sum(expr: String): String =
    s"CAST(round(sum($expr),2) AS DOUBLE)"

  /** DuckDB mirror of [[davg]]. */
  def sqlDavg(expr: String): String =
    s"CAST(round(sum(CAST(${sqlFinite(s"($expr)")} AS DECIMAL(14,8))),6) AS DOUBLE) / count(*)"

  /** DuckDB mirror of [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"CAST(round(sum(CAST(${sqlFinite(s"($expr)")} AS DECIMAL(18,6))),4) AS DOUBLE)"

  /** DuckDB mirror of [[dsumsq]]. Declared width 19 (not 18): DuckDB
    * multiplies width-18 decimals in their int64 storage and overflows;
    * width 19 forces int128 and yields the exact DECIMAL(38,12) product —
    * numerically identical to Spark's (18,6)→(37,12). */
  def sqlDsumsq(expr: String): String =
    s"CAST(round(sum(CAST(${sqlFinite(s"($expr)")} AS DECIMAL(19,6)) * CAST(${sqlFinite(s"($expr)")} AS DECIMAL(19,6))),4) AS DOUBLE)"

  /** Cross-engine-portable double of a big exact INTEGER decimal
    * (scale 0, 0 ≤ v < 10^33): above 2^53 a direct decimal→double cast
    * is NOT engine-portable — each engine correctly-rounds from a
    * different internal representation (Spark's BigDecimal vs DuckDB's
    * int64/int128 storage) and the last ulp can differ, which a
    * variance-style cancellation then amplifies (q174's sf1 divergence:
    * s2 ≈ 6·10^20, σ off at 1e-14 relative). This splits v exactly into
    * THREE 2^30-radix words — the top word stays < 2^53 for every
    * v < 2^113 ≈ 1.04·10^34, so each word casts EXACTLY (a single split
    * only held to v < 2^83 ≈ 9.7·10^24; its stated 10^29 bound was
    * wrong, caught by the r10 review) — and recombines with one IEEE
    * multiply-add per word: every engine computes the identical float
    * sequence on identical inputs, so the result is bit-identical by
    * construction (it may differ from the correctly-rounded direct cast
    * by an ulp per level — portability, not last-ulp accuracy, is the
    * contract; callers immediately divide into doubles anyway).
    * NON-NEGATIVE v only (second moments, counts): the mirrors pair
    * Spark's floored pmod with DuckDB's truncating HUGEINT `%`, which
    * agree iff v ≥ 0. Mirror: [[sqlPortableDouble]].
    *
    * The contract is ENFORCED, not just documented (r11 ADVICE): outside
    * [0, 10^33) the two engines would diverge SILENTLY in different ways
    * — Spark's decimal(29,0) intermediate overflows (NULL / ANSI error)
    * while DuckDB's HUGEINT words keep computing a wrong value up to
    * 2^113 — and nothing in a caller's column type (q348's g_num is
    * decimal(38,0)) pins the bound. Both sides add a lazily-evaluated
    * poison term that raises on an out-of-contract row, so a violation
    * fails the gate loudly instead of hash-diverging. */
  def portableDouble(v: Column): Column = {
    val radix = 1073741824L // 2^30
    val r = lit(radix).cast("decimal(10,0)")
    val w0 = pmod(v, r)
    val q1 = ((v - w0) / r).cast("decimal(29,0)") // < 2^83 for v < 10^33
    val w1 = pmod(q1, r)
    val w2 = ((q1 - w1) / r).cast("decimal(23,0)") // < 2^53 for v < 2^113
    val guard = when(v.isNotNull && (v < 0 || v >= lit(PD_BOUND)),
      raise_error(concat(lit("portableDouble out of contract [0, 1e33): "),
        v.cast("string"))).cast("double")).otherwise(lit(0.0))
    guard + ((w2.cast("double") * radix.toDouble + w1.cast("double")) *
      radix.toDouble + w0.cast("double"))
  }

  /** 10^33 as an exact scale-0 decimal (the [[portableDouble]] contract
    * bound; a float literal would blur the edge). */
  private val PD_BOUND =
    new java.math.BigDecimal("1000000000000000000000000000000000")

  /** DuckDB mirror of [[portableDouble]] — HUGEINT words, same radix,
    * same three-word split and recombination order, same loud
    * out-of-contract poison (CASE is lazy; the added 0.0 cannot perturb
    * a non-negative result). `expr` must be an integer-valued decimal
    * (scale 0), 0 ≤ v < 10^33. */
  def sqlPortableDouble(expr: String): String = {
    val q1 = s"(CAST($expr AS HUGEINT) // 1073741824)"
    val bound = "CAST('1000000000000000000000000000000000' AS HUGEINT)"
    s"((CASE WHEN ($expr) IS NOT NULL AND (($expr) < 0 OR" +
      s" CAST($expr AS HUGEINT) >= $bound)" +
      s" THEN error('portableDouble out of contract [0, 1e33): ' ||" +
      s" ($expr)) ELSE 0.0 END)" +
      s" + ((CAST($q1 // 1073741824 AS DOUBLE) * 1073741824.0" +
      s" + CAST($q1 % 1073741824 AS DOUBLE)) * 1073741824.0" +
      s" + CAST(CAST($expr AS HUGEINT) % 1073741824 AS DOUBLE)))"
  }

  /** [[portableDouble]] for SIGNED integer decimals (|v| < 10^33):
    * sign and magnitude split portably — `abs` on the exact decimal,
    * the non-negative split-cast, one multiply by ±1. Both engines
    * compute the identical sequence; needed where the exact integer is
    * a DIFFERENCE that can go negative (autocovariances, centered
    * sums). Mirror: [[sqlPortableDoubleSigned]]. */
  def portableDoubleSigned(v: Column): Column =
    when(v < 0, lit(-1.0)).otherwise(lit(1.0)) * portableDouble(abs(v))

  /** DuckDB mirror of [[portableDoubleSigned]]. */
  def sqlPortableDoubleSigned(expr: String): String =
    s"((CASE WHEN ($expr) < 0 THEN -1.0 ELSE 1.0 END) * " +
      s"${sqlPortableDouble(s"abs($expr)")})"

  /** Engine-portable k-decimal snap of a raw double: floor(x·10^k + 0.5)
    * / 10^k — the identical IEEE sequence in both engines, where
    * `round(double, k)` is NOT portable on half-boundary renderings
    * (Spark rounds the shortest decimal repr, DuckDB the binary value;
    * q138/q230/q346 each flipped rows at the r10 sf1 sweep's
    * magnitudes). Semantics: half-toward-+inf (negatives included —
    * deterministic, just not half-away-from-zero). |x|·10^k must stay
    * below 2^53 for the snap to mean anything; NULL passes through.
    * Mirror: [[sqlSnap]]. */
  def snap(c: Column, k: Int): Column = {
    val p = math.pow(10.0, k)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** DuckDB mirror of [[snap]] (dual-dialect: floor/arithmetic only). */
  def sqlSnap(expr: String, k: Int): String =
    s"(floor(($expr) * 1e$k + 0.5) / 1e$k)"
}
