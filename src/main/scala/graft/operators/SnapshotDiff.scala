package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff between two snapshots of a dataset — the dataset-versioning
  * primitive of a training-data pipeline: between crawl N−1 and crawl N,
  * which documents appeared, disappeared, or changed? The same shape
  * audits warehouse table versions (CDC without a changelog: diff the
  * materialized states).
  *
  * Scale shape: ONE shuffle-on-key full-outer join between the snapshots
  * (AQE handles skew), presence detected via literal marker columns (no
  * second pass over either side, no count, no collect), per-column
  * null-safe value comparison. Output is one row per key in either
  * snapshot with its change class — a filter on `change != 'unchanged'`
  * pushes into the join's output before anything downstream shuffles.
  */
object SnapshotDiff {

  /** One row per key in `a` ∪ `b`, classified:
    *  - `added`     — key only in `b`
    *  - `removed`   — key only in `a`
    *  - `changed`   — key in both, some value column differs (null-safe)
    *  - `unchanged` — key in both, all value columns equal (null-safe)
    * plus `old_<col>` / `new_<col>` for every value column (NULL on the
    * absent side — callers feeding an engine-comparison harness should
    * coalesce sentinels, see q83).
    *
    * Keys must be non-null on both sides: the equi-join is null-rejecting,
    * so a NULL-keyed row would silently vanish from the diff (asserted
    * nowhere — document-id / primary-key columns are non-null by
    * construction in every source this engine reads). */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(valueCols.nonEmpty, "diff needs at least one value column")
    val aa = a.select((keys ++ valueCols).map(col): _*)
      .withColumn("__in_a", lit(true))
    val bb = valueCols.foldLeft(
        b.select((keys ++ valueCols).map(col): _*)
          .withColumn("__in_b", lit(true))) {
      (d, c) => d.withColumnRenamed(c, s"__b_$c")
    }
    val joined = aa.join(bb, keys, "full_outer")
    val same = valueCols.map(c => col(c) <=> col(s"__b_$c")).reduce(_ && _)
    val change = when(col("__in_a").isNull, "added")
      .when(col("__in_b").isNull, "removed")
      .when(same, "unchanged")
      .otherwise("changed")
    joined.select(
      keys.map(col)
        ++ Seq(change.as("change"))
        ++ valueCols.map(c => col(c).as(s"old_$c"))
        ++ valueCols.map(c => col(s"__b_$c").as(s"new_$c")): _*)
  }
}
