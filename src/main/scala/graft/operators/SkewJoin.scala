package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed equi-joins.
  *
  * AQE's skew-join handling (on by default) splits oversized sort-merge
  * partitions at runtime and is the right first answer; explicit salting
  * remains necessary when a single key's rows must still be joined — e.g.
  * a shuffle hash join against a mid-sized build side that cannot
  * broadcast, or a skewed aggregation-after-join pattern AQE can't split.
  *
  * Mechanics: the probe (large, skewed) side gets a uniform pseudo-random
  * salt in [0, saltFactor); the build side is replicated `saltFactor`
  * times with every salt value; the join adds the salt to the key. One
  * hot key's rows then spread over `saltFactor` reducers instead of one.
  * Replication multiplies the build side — keep `saltFactor` ≈ (hot-key
  * rows / average-partition rows), not larger.
  *
  * The salt derives from `xxhash64` of the probe row's whole key set plus
  * a monotonic id — deterministic per run-shape, uniform, no RNG state.
  */
object SkewJoin {

  /** Inner equi-join of `probe` (skewed) with `build` on `keys`, salted
    * `saltFactor` ways. Result equals `probe.join(build, keys)` row-for-row
    * (duplicate multiplicities included). */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*),
        lit(saltFactor.toLong)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
