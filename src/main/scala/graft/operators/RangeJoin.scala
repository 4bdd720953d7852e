package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: pair each point row with every interval
  * row whose half-open window `[start, end)` contains the point's
  * timestamp — the attribution / validity-window join that complements
  * [[AsOfJoin]] (latest-at-or-before) when MULTIPLE intervals may claim a
  * point and intervals have explicit ends.
  *
  * Spark plans a raw `p.ts >= i.start AND p.ts < i.end` condition as a
  * broadcast-nested-loop (or cartesian) join — O(|P|·|I|) comparisons,
  * which is a non-starter when both sides are large. This operator turns
  * it into an EQUI-join on a fixed-width time bin: every interval is
  * exploded onto the bins it overlaps, every point is assigned its single
  * bin, the sides hash-join on the bin, and the exact containment
  * predicate filters the survivors. Because a point has exactly one bin,
  * each qualifying (point, interval) pair is produced exactly once — no
  * dedup pass.
  *
  * Scale shape: one linear explode of the interval side (× bins-per-
  * interval, a knob the caller sizes to the typical window length), then a
  * single shuffle of both sides on `__bin` — the same cost profile as any
  * equi-join, AQE skew-split applies to hot bins. Cost is
  * O(|P| + |I|·E[bins/interval] + |matches|); pick `binSeconds` near the
  * typical interval length so E[bins/interval] ≈ 2. Intervals longer than
  * `maxBinsPerInterval` bins fail loudly (a mis-sized bin width silently
  * exploding 10⁶ rows per interval is the failure mode to refuse).
  */
object RangeJoin {

  /** Floor-division of an epoch-microsecond column by a positive bin
    * width, exact for |epoch| < 2⁵³ µs (≈ year 2255): `a − pmod(a, b)` is
    * an exact multiple of `b` in double precision there, so the IEEE
    * division yields the integer quotient exactly; `pmod` (not `%`) keeps
    * the floor semantics for pre-1970 timestamps. */
  private def binOf(epochMicros: Column, binMicros: Long): Column =
    ((epochMicros - pmod(epochMicros, lit(binMicros))) / lit(binMicros))
      .cast("long")

  /** Inner point-in-interval join (half-open: `start <= ts < end`).
    *
    * Column names of the two inputs must be disjoint (rename before
    * calling, as with any Spark join); `pointTs`/`startTs`/`endTs` are
    * timestamp columns. Empty windows (`end <= start`) match nothing.
    * Left-join semantics (keep pointless intervals / intervalless points)
    * compose on top: aggregate this result and left-join it back.
    */
  def pointInInterval(points: DataFrame, pointTs: String,
      intervals: DataFrame, startTs: String, endTs: String,
      binSeconds: Long = 3600L, maxBinsPerInterval: Long = 10000L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val binUs = binSeconds * 1000000L

    val startBin = binOf(unix_micros(col(startTs)), binUs)
    // end is exclusive: the last overlapped bin is the one holding end−1µs
    val endBin = binOf(unix_micros(col(endTs)) - lit(1L), binUs)
    val iv = intervals
      .filter(col(endTs) > col(startTs))
      .withColumn("__bin", explode(sequence(
        startBin,
        // loud fail instead of a silent 10^6-row-per-interval explode
        when(endBin - startBin >= lit(maxBinsPerInterval),
          raise_error(concat(lit(s"RangeJoin: interval spans more than " +
            s"$maxBinsPerInterval bins of ${binSeconds}s at "), col(startTs))))
          .otherwise(endBin))))

    val pt = points
      .withColumn("__bin", binOf(unix_micros(col(pointTs)), binUs))

    pt.join(iv, Seq("__bin"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__bin")
  }
}
