package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable count-min sketch (Cormode & Muthukrishnan '05) — bounded-size
  * frequency estimation, the point-query counterpart to [[Hll]]'s
  * distinct-count sketch.
  *
  * An exact per-key frequency table is as large as the key space; at 100 TB
  * a "how often does this URL/user/shingle occur" question should not
  * require materializing billions of counters. The CMS here is a fixed
  * d×w = 4×1024 grid of counters:
  *  - each occurrence increments one counter per row (d portable hashes);
  *  - a point estimate is the MIN over the d counters — always ≥ the true
  *    count (counters only ever overcount, never undercount), with the
  *    overcount bounded by ~2n/w per row at 1−(1/2)^d confidence;
  *  - sketches are **mergeable** by element-wise SUM: counts are additive,
  *    so per-day / per-partition sketches roll up without re-reading raw
  *    keys, and sketch(A ⊎ B) ≡ merge(sketch(A), sketch(B)) exactly.
  *
  * Everything is integer arithmetic over a portable hash
  * ([[TextHash.md5Bits60]] salted per row), so the operator is
  * deterministic and cross-engine oracle-checkable bit-for-bit — no
  * estimate-tolerance needed, the oracle reproduces the same grid.
  *
  * Scale shape: the build is one map-side-combinable hash aggregation
  * keyed on (row, counter) — at most d·w rows survive regardless of input
  * size; lookup broadcasts the bounded grid.
  */
object Cms {

  /** Depth: number of independent hash rows. P(overshoot in every row)
    * halves per row. */
  val D = 4

  /** Width: counters per row. Expected per-row overcount ≈ n/w. */
  val W = 1024

  /** Counter index of `key` in row `r`: portable 60-bit md5 value of the
    * row-salted key string, mod w. Nonnegative by construction. */
  private def pos(key: Column, r: Int): Column =
    pmod(TextHash.md5Bits60(concat(key.cast("string"), lit(s"|cms$r"))),
      lit(W.toLong))

  /** The d (row, counter) cells `key` increments — exposed package-wide
    * so the streaming twin can build the identical grid under a windowed
    * aggregation. */
  private[graft] def cells(key: Column): Column =
    array((0 until D).map { r =>
      struct(lit(r).as("r"), pos(key, r).as("c"))
    }: _*)

  /** Build the (r, c, cnt) counter grid for a key column: one explode to
    * d rows per input row, one hash aggregation. Output is ≤ d·w rows. */
  def sketch(df: DataFrame, keyCol: String): DataFrame =
    df.select(explode(cells(col(keyCol))).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge two counter grids (e.g. yesterday's rollup + today's batch):
    * union + per-cell SUM. Associative and commutative;
    * sketch(A ⊎ B) ≡ merge(sketch(A), sketch(B)) exactly. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("c"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate the frequency of each probe key: min over the d
    * counters, 0 for keys hitting an empty cell (never-seen keys can only
    * report 0 or a small collision overcount — never a miss of a real
    * count). The grid is bounded (≤ d·w rows), so it broadcasts. */
  def lookup(sk: DataFrame, probes: DataFrame, keyCol: String): DataFrame =
    probes.select(col(keyCol), explode(cells(col(keyCol))).as("rc"))
      .select(col(keyCol), col("rc.r").as("r"), col("rc.c").as("c"))
      .join(broadcast(sk), Seq("r", "c"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))

  /** Join-size estimate from two sketches (Alon-Matias-Szegedy style
    * inner product, Cormode & Muthukrishnan §4.2): |A ⋈ B| on a key =
    * Σ_k f_A(k)·f_B(k), estimated per sketch row as Σ_c a[r][c]·b[r][c]
    * and finalized as the MIN over the d rows. Like the point estimate
    * it can only OVERcount (hash collisions add cross terms, never
    * remove mass), so est ≥ truth always — the pre-flight "will this
    * join/self-join explode" check that costs two bounded grids instead
    * of running the join. A row with no overlapping non-zero cells has
    * inner product 0, so the min runs over a generated 0..d-1 frame
    * rather than only the rows the join happens to produce. */
  def innerProduct(a: DataFrame, b: DataFrame): DataFrame = {
    val prods = a
      .join(b.withColumnRenamed("cnt", "cnt_b"), Seq("r", "c"))
      .groupBy(col("r"))
      .agg(sum(col("cnt") * col("cnt_b")).as("ip"))
    a.sparkSession.range(D).select(col("id").cast("int").as("r"))
      .join(prods, Seq("r"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("cms_join_est"))
  }

  /** DuckDB mirror of the row-salted counter index for `expr`. */
  def sqlPos(expr: String, rExpr: String): String =
    TextHash.sqlMd5Bits60(
      s"CAST($expr AS VARCHAR) || '|cms' || CAST($rExpr AS VARCHAR)") +
      s" % $W"

  /** DuckDB mirror of [[sketch]] over `FROM (srcSql) src` with a `key`
    * column. Emits CTE `name` (r, c, cnt). */
  def sqlSketchCtes(srcSql: String, name: String): String = s"""$name AS (
      SELECT rs.r, ${sqlPos("key", "rs.r")} AS c,
        CAST(count(*) AS BIGINT) AS cnt
      FROM ($srcSql) AS src
      CROSS JOIN (SELECT unnest(generate_series(0, ${D - 1})) AS r) rs
      GROUP BY 1, 2)"""

  /** [[sqlSketchCtes]] under the historical default CTE name. */
  def sqlSketchCtes(srcSql: String): String = sqlSketchCtes(srcSql, "cms_sk")

  /** DuckDB mirror of [[innerProduct]] over sketch CTEs `aName`/`bName`.
    * Emits CTEs `<outName>_prod` and `outName` (cms_join_est). */
  def sqlInnerProductCtes(aName: String, bName: String,
      outName: String): String = s"""${outName}_prod AS (
      SELECT a.r, CAST(sum(a.cnt * b.cnt) AS BIGINT) AS ip
      FROM $aName a JOIN $bName b ON a.r = b.r AND a.c = b.c
      GROUP BY 1),
    $outName AS (
      SELECT CAST(min(coalesce(p.ip, 0)) AS BIGINT) AS cms_join_est
      FROM (SELECT unnest(generate_series(0, ${D - 1})) AS r) rs
      LEFT JOIN ${outName}_prod p ON p.r = rs.r)"""

  /** DuckDB mirror of [[lookup]] against `cms_sk` over `FROM (probesSql)`
    * with a `key` column. Emits CTE `cms_lk` (key, cms_est). */
  def sqlLookupCtes(probesSql: String): String = s"""cms_lk AS (
      SELECT p.key, CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cms_est
      FROM ($probesSql) AS p
      CROSS JOIN (SELECT unnest(generate_series(0, ${D - 1})) AS r) rs
      LEFT JOIN cms_sk s
        ON s.r = rs.r AND s.c = ${sqlPos("p.key", "rs.r")}
      GROUP BY p.key)"""
}
