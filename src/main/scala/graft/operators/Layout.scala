package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Space-filling-curve layout keys: the Z-order (Morton) interleave of two
  * dimension columns, used to CLUSTER data so that one sorted write gives
  * min/max row-group pruning on BOTH dimensions at once (the multi-column
  * analogue of `sortWithinPartitions` on one column; same idea as
  * Delta/Iceberg table Z-ordering — see Morton 1966, and Orenstein &
  * Merrett SIGMOD '84 for range queries over the curve).
  *
  * Usage at scale: `df.repartitionByRange(N, mortonKey(...)).
  * sortWithinPartitions(mortonKey(...)).write.parquet(...)` — a point or
  * box predicate on either dimension then prunes most row groups, because
  * any aligned run of the curve bounds both coordinates.
  *
  * The interleave is pure 64-bit integer arithmetic (5 shift-or-mask
  * rounds per dimension, the standard magic-number bit spread), fully
  * codegen'd, bit-identical on any engine — [[sqlMortonKey]] emits the
  * same arithmetic for the DuckDB oracle (decimal mask literals: DuckDB
  * mis-parses 0x constants as `0` aliased `x…`).
  */
object Layout {

  /** (shift, mask) rounds spreading a 32-bit value onto even bits of a
    * long: 0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F,
    * 0x3333333333333333, 0x5555555555555555 in decimal. */
  private val rounds: Seq[(Int, Long)] = Seq(
    16 -> 281470681808895L,
    8 -> 71777214294589695L,
    4 -> 1085102592571150095L,
    2 -> 3689348814741910323L,
    1 -> 6148914691236517205L)

  private val maxCoord = 2147483647L // 2^31 − 1: keeps the key positive

  private def spread(c: Column): Column =
    rounds.foldLeft(c) { case (x, (sh, m)) =>
      x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }

  private def checked(c: Column): Column =
    when(c < 0 || c > maxCoord,
      raise_error(concat(lit(s"Layout.mortonKey: coordinate out of [0, $maxCoord]: "),
        c.cast("string"))))
      .otherwise(c.cast("long"))

  /** Z-order key of two coordinates in [0, 2³¹−1]: x on even bits, y on
    * odd — always a non-negative long. Out-of-range input fails loudly
    * (silent masking would scramble locality, the one property the key
    * exists to provide). */
  def mortonKey(x: Column, y: Column): Column =
    spread(checked(x)).bitwiseOR(shiftleft(spread(checked(y)), 1))

  private def sqlSpread(expr: String): String =
    rounds.foldLeft(s"CAST(($expr) AS BIGINT)") { case (e, (sh, m)) =>
      s"((($e) | (($e) << $sh)) & $m)"
    }

  /** DuckDB mirror of [[mortonKey]] (assumes in-range input — the oracle
    * side has no raise_error). */
  def sqlMortonKey(xExpr: String, yExpr: String): String =
    s"(${sqlSpread(xExpr)} | (${sqlSpread(yExpr)} << 1))"
}
