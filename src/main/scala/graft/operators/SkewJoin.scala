package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins — the standard remedy when one join key
  * carries a disproportionate share of the rows and a single reducer
  * becomes the straggler.
  *
  * Mechanics: the skewed (large) side scatters each row into one of
  * `saltFactor` sub-keys via a DETERMINISTIC hash of the row's content
  * (never `rand()`/`monotonically_increasing_id()` — task retries and
  * recomputed partitions would re-salt differently, silently corrupting
  * the join under fault recovery); the other side is replicated once per
  * salt value. Joining on (keys, salt) then splits every hot key across
  * `saltFactor` reducers. Output is row-for-row identical to the plain
  * equi-join (asserted by OperatorsSpec on a 10^5-row hot-key corpus).
  *
  * When to reach for it: AQE's skew-join (`spark.sql.adaptive.skewJoin`)
  * already splits oversized *sort-merge* partitions at runtime and is the
  * first choice. Explicit salting still covers the cases AQE can't: skewed
  * shuffled-hash joins, skew hidden behind a pre-existing partitioning the
  * planner wants to reuse, and pipelines where the replicated side must be
  * co-partitioned for later stages. Cost: `saltFactor` copies of the
  * replicated side's shuffle — keep the factor near the hot-key
  * multiplicity, not higher.
  */
object SkewJoin {

  /** Deterministic salt in [0, saltFactor) from the given columns (use the
    * row's stable identifier columns, or all of them). */
  def salt(saltFactor: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor.toLong)).cast("int")

  /** Inner equi-join of `skewed` against `other` on `keys`, with the
    * skewed side scattered across `saltFactor` sub-keys and `other`
    * replicated per salt. Column layout matches
    * `skewed.join(other, keys)`: key columns first, then the remaining
    * columns of each side. */
  def saltedInnerJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int, saltCols: Seq[String] = Seq.empty): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val saltSrc =
      (if (saltCols.nonEmpty) saltCols else skewed.columns.toSeq).map(col)
    val l = skewed.withColumn("__salt", salt(saltFactor, saltSrc))
    val r = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
