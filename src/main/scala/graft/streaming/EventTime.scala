package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Session-zone pinning for event-time streaming semantics.
  *
  * The events fixture stores timestamps as naive wall clocks (parquet
  * TIMESTAMP(MICROS, isAdjustedToUTC=false)); streaming needs LTZ
  * (watermarks, `window()`, `unix_micros` are all instant-based), and the
  * plain NTZ→LTZ cast interprets the wall clock in the SESSION zone — so
  * every derived instant (epoch micros, hour/day bucket boundaries,
  * watermark-relative state) would shift with the session zone, found
  * empirically by the r8 timezone-invariance sweep (7 streaming twins
  * hash-diverged at Asia/Kathmandu, +05:45, while all 347 batch queries —
  * wall-clock-closed end to end — stayed green).
  *
  * The contract here: event time is UTC, independent of the session zone.
  *  - [[pinIn]] turns the wall-preserving LTZ cast into the instant whose
  *    UTC rendering equals the stored wall clock (`from_utc_timestamp`
  *    adds the zone offset back).
  *  - [[pinOut]] is the inverse for rendering: applied before any
  *    LTZ→date / LTZ→NTZ cast, the rendered value equals the instant's
  *    UTC wall clock whatever the session zone.
  * Both read the zone via `current_timezone()`, evaluated under the conf
  * of the session the query EXECUTES on — not captured at plan build.
  * (The capture-at-build form was tried first and failed EventTimeSpec:
  * `SQLConf.get` reads the THREAD-ACTIVE session, and `newSession()`
  * does not change it, so a plan built on one thread for a different
  * session pinned the wrong zone — the classic active-vs-owning-session
  * trap.) Both are exact identities under a UTC session (the
  * Verify/Bench/test default). DST-transition instants (where the zone
  * offset itself changes between `t` and `t − offset`) are the one
  * measure-zero caveat; fixed-offset zones (UTC, Kathmandu) have none.
  */
object EventTime {

  /** Stored-wall-clock LTZ (the [[graft.sources.Tables.events]] cast) →
    * the instant whose UTC wall equals that stored wall. */
  def pinIn(c: Column): Column = from_utc_timestamp(c, current_timezone())

  /** Instant → the instant whose SESSION-zone rendering equals the
    * original's UTC rendering; compose with `.cast("date")` /
    * `.cast("timestamp_ntz")` for zone-independent output rendering. */
  def pinOut(c: Column): Column = to_utc_timestamp(c, current_timezone())

  /** Calendar day of an event-time instant, rendered in UTC regardless of
    * the session zone. */
  def utcDay(c: Column): Column = pinOut(c).cast("date")

  /** [[pinOut]] applied to every top-level TimestampType column — the
    * uniform output guard for frames read back from a streaming sink
    * before the catalog's NTZ output cast renders them. */
  def pinOutAll(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampType => d.withColumn(f.name, pinOut(col(f.name)))
        case _             => d
      }
    }
}
