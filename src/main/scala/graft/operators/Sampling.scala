package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and splitting — how training-data
  * pipelines carve stable subsets at corpus scale.
  *
  * `df.sample()` draws from a per-partition RNG: the selected rows change
  * with partitioning, task retries, and input order, which silently breaks
  * train/val hygiene (a row can cross splits between runs). Hashing a
  * stable key instead gives every row a permanent bucket — reproducible
  * across engines, runs, and cluster layouts, with no coordination and no
  * extra pass. The hash is the portable md5-derived 60-bit value
  * ([[TextHash.md5Bits60]]), so a SQL oracle (or any other engine) assigns
  * the identical buckets.
  *
  * Scale shape: a pure scan-side filter/projection — no shuffle, no state;
  * bucket predicates push into the scan like any other filter.
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a key column (key is stringified so
    * numeric and string keys hash identically across engines). */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    pmod(TextHash.md5Bits60(key.cast("string")), lit(buckets.toLong))
  }

  /** Keep rows whose key lands in `keep` of `outOf` buckets — a
    * deterministic ≈(keep/outOf) sample. */
  def deterministicSample(df: DataFrame, keyCol: String, keep: Int,
      outOf: Int = 100): DataFrame =
    df.filter(hashBucket(col(keyCol), outOf) < keep)

  /** Adds a `split` column: "val" for `valBuckets` of `outOf` buckets,
    * "train" otherwise. Every row keeps its assignment forever — the
    * leakage-safe split for corpora that grow between runs. */
  def hashSplit(df: DataFrame, keyCol: String, valBuckets: Int,
      outOf: Int = 100): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(keyCol), outOf) < valBuckets, "val")
        .otherwise("train"))

  /** DuckDB mirror of [[hashBucket]]. */
  def sqlHashBucket(expr: String, buckets: Int): String =
    s"(${TextHash.sqlMd5Bits60(s"CAST($expr AS VARCHAR)")} % $buckets)"

  /** Weighted sampling without replacement (Efraimidis & Spirakis '06,
    * A-Res), derandomized: each row's exponential key is
    * `−ln(u)/weight` with `u` the row's PORTABLE HASH mapped into (0,1]
    * — so which k rows are selected is a pure function of the keys and
    * weights, reproducible across engines/runs/layouts, yet the
    * selection distribution matches true weighted sampling over the
    * hash's pseudo-randomness. Heavier rows get systematically smaller
    * keys; the k smallest keys win. The single `ln` is snapped to 12
    * decimals (ties break on the key column), everything else is exact.
    *
    * Scale shape: a scan-side key expression + one distributed top-k
    * (TakeOrdered) — no shuffle of the corpus, no RNG state. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (TextHash.md5Bits60(col(keyCol).cast("string")).cast("double") +
      lit(1.0)) / lit(1152921504606846976.0) // 2^60: u in (0, 1]
    df.filter(col(weightCol) > 0)
      .withColumn("es_key",
        round(-log(u) / col(weightCol).cast("double"), 12))
      .orderBy(col("es_key"), col(keyCol))
      .limit(k)
  }

  /** DuckDB mirror of [[weightedSample]]'s key expression. */
  def sqlEsKey(keyExpr: String, weightExpr: String): String =
    s"round(-ln((${TextHash.sqlMd5Bits60(s"CAST($keyExpr AS VARCHAR)")}" +
      s" + 1.0) / 1152921504606846976.0) / CAST($weightExpr AS DOUBLE), 12)"

  /** Exactly-k-per-group deterministic uniform sample ("hash reservoir"):
    * rank rows inside each group by the portable hash of their key and
    * keep the k smallest. Because the hash is a pure function of the key,
    * the selected set is stable across runs, partitionings, and engines —
    * a reproducible `GROUP BY ... LIMIT k` sample, which `TABLESAMPLE`
    * and `rand()` fundamentally are not. Requires `keyCol` unique per row
    * (use the row's natural id); the hash tie-breaks on the key itself so
    * the rank is total.
    *
    * Scale shape: one window top-k per group — Spark sorts within group
    * partitions only; the output is bounded by #groups·k. */
  def hashReservoir(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(TextHash.md5Bits60(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Domain-balanced downsampling: deterministically thin every group to
    * ≈ the smallest group's size — the mixture-rebalancing step of a
    * training-data pipeline (a dominant domain would otherwise swamp the
    * mixture). Each group's keep-rate is `min_count / count`, applied as
    * an integer bucket threshold `(min_count · buckets) div count` over
    * the same stable per-row hash as [[hashSplit]] — so which rows survive
    * is a pure function of their key, reproducible across engines, runs,
    * and layouts (integer `div` on both engines: no float-rounding drift).
    *
    * Scale shape: one tiny group-count aggregation (rows = #groups)
    * broadcast back onto the scan, then a pure filter — the corpus itself
    * is never shuffled. */
  def balancedSample(df: DataFrame, keyCol: String, groupCol: String,
      buckets: Int = 10000): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    val minCnt = counts.agg(min(col("__cnt")).as("__min_cnt"))
    val thresh = counts.crossJoin(broadcast(minCnt))
      .select(col(groupCol),
        expr(s"(__min_cnt * ${buckets}L) div __cnt").as("__thresh"))
    // null-safe equality: a NULL group key is a group like any other
    // (groupBy already counts it as one) — a plain equi-join would
    // silently delete those rows while their count still drove min_count.
    // The threshold-side key is RENAMED before the join: thresh derives
    // from df, so df(groupCol)/thresh(groupCol) resolve to the same
    // attribute and Spark would build a trivially-true self-join predicate
    val t = broadcast(thresh.withColumnRenamed(groupCol, "__grp"))
    df.join(t, col(groupCol) <=> col("__grp"), "inner")
      .filter(hashBucket(col(keyCol), buckets) < col("__thresh"))
      .drop("__grp", "__thresh")
  }

  /** Temperature-weighted mixture downsampling at α = ½: each group's
    * target size is the geometric mean `⌊√(min_count · count)⌋` — the
    * standard LLM-pretraining mixture reweighting (sampling weight
    * ∝ countᵃ) pinned at the midpoint between [[balancedSample]] (α = 0,
    * every group thinned to the minimum) and the natural distribution
    * (α = 1, no thinning); the smallest group is kept in full, large
    * groups are damped, not flattened.
    *
    * Engine determinism: the only floating-point step is one IEEE-754
    * `sqrt` of an integer product (exact below 2⁵³; beyond that still
    * deterministic, merely of a rounded product). `sqrt` is correctly
    * rounded by spec on every IEEE engine — unlike `pow`, which is why
    * the α = ½ point is the one exposed with a SQL-oracle mirror — so the
    * integer thresholds, and therefore the surviving ROWS, are identical
    * across engines, runs, and layouts.
    *
    * Scale shape: identical to [[balancedSample]] — a tiny group-count
    * aggregation broadcast back onto the scan, then a pure filter; the
    * corpus itself never shuffles. */
  def mixtureSample(df: DataFrame, keyCol: String, groupCol: String,
      buckets: Int = 10000): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    val minCnt = counts.agg(min(col("__cnt")).as("__min_cnt"))
    val thresh = counts.crossJoin(broadcast(minCnt))
      .select(col(groupCol),
        expr(s"(CAST(floor(sqrt(CAST(__min_cnt * __cnt AS DOUBLE))) AS BIGINT)" +
          s" * ${buckets}L) div __cnt").as("__thresh"))
    // same null-safe, renamed-key join as balancedSample (see above)
    val t = broadcast(thresh.withColumnRenamed(groupCol, "__grp"))
    df.join(t, col(groupCol) <=> col("__grp"), "inner")
      .filter(hashBucket(col(keyCol), buckets) < col("__thresh"))
      .drop("__grp", "__thresh")
  }

  /** DuckDB mirror of [[mixtureSample]]'s keep predicate (CTE body; same
    * contract as [[sqlBalancedKeptCtes]]). */
  def sqlMixtureKeptCtes(keyExpr: String, groupCol: String,
      buckets: Int = 10000): String =
    s"""counts AS (SELECT $groupCol, count(*) AS __cnt FROM documents GROUP BY $groupCol),
       |m AS (SELECT min(__cnt) AS __min_cnt FROM counts),
       |thresh AS (
       |  SELECT $groupCol AS __grp, __cnt,
       |    (CAST(floor(sqrt(CAST(__min_cnt * __cnt AS DOUBLE))) AS BIGINT)
       |     * $buckets) // __cnt AS __th
       |  FROM counts CROSS JOIN m),
       |kept AS (
       |  SELECT d.*, t.__cnt
       |  FROM documents d JOIN thresh t ON d.$groupCol IS NOT DISTINCT FROM t.__grp
       |  WHERE ${sqlHashBucket(keyExpr, buckets)} < t.__th)""".stripMargin

  /** DuckDB mirror of [[balancedSample]]'s keep predicate (CTE body;
    * expose `kept` = the surviving rows of `documents` plus `__cnt`).
    * The join mirrors the operator's null-safe `<=>`: `IS NOT DISTINCT
    * FROM`, not `USING` — a `USING` join is null-rejecting and would
    * silently drop a NULL group that the operator (and the group counts)
    * keep. */
  def sqlBalancedKeptCtes(keyExpr: String, groupCol: String,
      buckets: Int = 10000): String =
    s"""counts AS (SELECT $groupCol, count(*) AS __cnt FROM documents GROUP BY $groupCol),
       |m AS (SELECT min(__cnt) AS __min_cnt FROM counts),
       |thresh AS (
       |  SELECT $groupCol AS __grp, __cnt, (__min_cnt * $buckets) // __cnt AS __th
       |  FROM counts CROSS JOIN m),
       |kept AS (
       |  SELECT d.*, t.__cnt
       |  FROM documents d JOIN thresh t ON d.$groupCol IS NOT DISTINCT FROM t.__grp
       |  WHERE ${sqlHashBucket(keyExpr, buckets)} < t.__th)""".stripMargin
}
