package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Stable
import graft.sources.JdbcUpsert

/** Structured Streaming counterparts of the batch event-log operators:
  * watermarked windowed aggregation, within-watermark dedup, and stateful
  * gap sessionization. Each transform takes a *streaming* DataFrame/Dataset
  * (`spark.readStream...`) and is sink-agnostic — callers attach
  * `writeStream` with their own trigger/output mode.
  *
  * Scale design: all state is keyed and bounded by the watermark — window
  * state expires once the watermark passes the window end, dedup keys
  * expire after the dedup horizon, and session state carries one open
  * session per user with an event-time timeout. Nothing accumulates
  * unboundedly, which is what makes these runnable forever on a real
  * cluster.
  */
object EventStreams {

  /** Event row of the `events` table (TESTDATA.md). `value` is Option:
    * raw telemetry ships NULL metrics, and a primitive Double field would
    * make the encoder kill the whole stream on the first such row
    * (NOT_NULL_ASSERT_VIOLATION) — none of the typed operators read the
    * metric, they only carry the row. `user_id` stays primitive ON
    * PURPOSE: the typed operators are entity-KEYED (sessions, debounce,
    * SCD2), and an event with no entity cannot be keyed — callers filter
    * to attributable rows first (BoundedRuns does; the matching oracle
    * carries the same predicate). */
  final case class Event(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String, value: Option[Double])

  /** A closed (or timed-out) session, same shape as the batch
    * [[graft.operators.Sessionize]] output. */
  final case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp)

  /** Mutable-across-batches state: the one open session per user.
    * `emitted` marks a session already closed by timeout — kept (not
    * removed) so `sessionSeq` keeps counting across session boundaries;
    * state per user is a single fixed-size record either way. Times are
    * epoch MICROS — `Timestamp.getTime` would truncate to millis and the
    * emitted sessions would disagree with the batch operator (and any
    * SQL oracle) in the sub-millisecond digits. */
  final case class OpenSession(sessionSeq: Long, nEvents: Long,
      startUs: Long, endUs: Long, emitted: Boolean = false)

  /** Timestamp ↔ epoch-micros, precision-preserving (getTime alone loses
    * the sub-millisecond digits; they live in getNanos). */
  private def tsUs(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def usTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Hourly (event-time) windowed counts + stable value sum per event
    * type. Late events beyond `watermarkDelay` are dropped and the window
    * state is freed — append mode emits each window exactly once, when the
    * watermark passes its end. */
  def hourlyCounts(events: DataFrame, tsCol: String = "ts",
      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Stable.msum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Daily HLL registers from the stream — the streaming half of the
    * [[graft.operators.Hll]] sketch: per (day window, register) max-ρ is
    * a plain watermarked windowed MAX, so state is bounded by windows ×
    * 256 registers regardless of key cardinality, and each day's
    * register set is emitted exactly once when the watermark closes it.
    * Estimation happens downstream in batch over the emitted register
    * table (the production "store sketches, query later" shape);
    * streamed registers are IDENTICAL to the batch sketch of the same
    * data — hash-equal, not approximately equal. */
  def hllDailyRegisters(events: DataFrame, keyCol: String,
      tsCol: String = "ts", watermarkDelay: String = "2 hours"): DataFrame = {
    import graft.operators.Hll
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 day"),
        Hll.regCol(col(keyCol)).as("reg"))
      .agg(max(Hll.rhoCol(col(keyCol))).as("rho"))
      .select(EventTime.utcDay(col("window.start")).as("day"), col("reg"),
        col("rho"))
  }

  /** Daily count-min counter cells from the stream — the streaming half
    * of the [[graft.operators.Cms]] sketch: each event increments its d
    * (row, counter) cells under a watermarked windowed COUNT, so state is
    * bounded by windows × d·w cells regardless of key cardinality, and a
    * day's grid is emitted exactly once when the watermark closes it.
    * Counts are ADDITIVE, so the emitted per-day grids merge downstream
    * (per-cell sum) into a grid identical to the batch sketch of the same
    * horizon — hash-equal, the mergeable-sketch property live. */
  def cmsDailyCells(events: DataFrame, keyCol: String,
      tsCol: String = "ts", watermarkDelay: String = "2 hours"): DataFrame = {
    import graft.operators.Cms
    events
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), explode(Cms.cells(col(keyCol))).as("rc"))
      .groupBy(window(col(tsCol), "1 day"),
        col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
      .select(EventTime.utcDay(col("window.start")).as("day"), col("r"),
        col("c"), col("cnt"))
  }

  /** Daily exact-decimal value moments for one event type — the
    * streaming half of a monitoring statistic (CUSUM, mSPRT, control
    * chart): per closed day, the count and decimal-exact value sum.
    * State is one (n, sum) row per open day; a day emits exactly once
    * when the watermark passes its end, and the emitted moments are
    * hash-identical to the batch aggregate of the same days — the
    * monitor itself then runs downstream in batch over the bounded
    * emitted frame ("store moments, decide later", the q130 register
    * shape applied to drift detection). */
  def dailyValueMoments(events: DataFrame, eventType: String,
      tsCol: String = "ts", watermarkDelay: String = "2 hours"): DataFrame =
    events
      // observation = finite metric (Stable.finite): corrupt doubles are
      // not observations, and they must not split n from sv bookkeeping
      .filter(col("event_type") === eventType && Stable.finite(col("value")))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sv"))
      .select(EventTime.utcDay(col("window.start")).as("day"), col("n"),
        col("sv"))

  /** Per-(day, arm) exact-decimal first and second value moments for one
    * event type — the streaming state behind a sequential A/B monitor
    * (q300's mSPRT): arms by user parity, one (n, sum, sumsq) row per
    * open (day, arm), emitted exactly once on watermark close. The
    * always-valid test statistic is then closed-form downstream on the
    * bounded emitted frame. */
  def dailyArmMoments(events: DataFrame, eventType: String,
      tsCol: String = "ts", watermarkDelay: String = "2 hours"): DataFrame =
    events
      // same finite-observation contract as [[dailyValueMoments]]
      .filter(col("event_type") === eventType && Stable.finite(col("value")))
      .withColumn("v", col("value").cast("decimal(18,6)"))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 day"),
        (col("user_id") % 2).cast("long").as("arm"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).cast("decimal(38,12)").as("svv"))
      .select(EventTime.utcDay(col("window.start")).as("day"), col("arm"),
        col("n"), col("sv"), col("svv"))

  /** Exactly-once event ids within the watermark horizon: duplicates of an
    * `event_id` arriving inside `watermarkDelay` are dropped; the key is
    * evicted from state afterwards (bounded memory, unlike plain
    * `dropDuplicates` on a stream). */
  def dedupEvents(events: DataFrame, tsCol: String = "ts",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** One debounce verdict per event. */
  final case class DebounceOut(user_id: Long, event_type: String,
      event_id: Long, kept: Boolean)

  /** Last event time of a (user, event_type) key, kept or dropped. */
  final case class LastSeen(tsUs: Long)

  /** Streaming face of the batch debounce (q194): an event is kept iff
    * it is its (user, event_type) key's first, or arrives more than
    * `gapUs` after the key's previous event — previous EVENT, kept or
    * dropped, exactly the batch lag-gap semantics. State is one
    * timestamp per key, evicted by event-time timeout `retentionSeconds`
    * after the key goes quiet — bounded like every state store here.
    * Within a micro-batch events are ordered by (ts, event_id), the
    * batch operator's total order; cross-batch order is the state's
    * problem (StreamingSpec pins a two-batch carry-over). */
  def debounce(events: Dataset[Event], gapUs: Long,
      watermarkDelay: String = "30 minutes",
      retentionSeconds: Long = 24 * 3600L): Dataset[DebounceOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LastSeen, DebounceOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), rows: Iterator[Event],
            state: GroupState[LastSeen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            var last = state.getOption.map(_.tsUs)
            val out = sorted.map { e =>
              val t = tsUs(e.ts)
              val kept = last.forall(lt => t - lt > gapUs)
              last = Some(t)
              DebounceOut(key._1, key._2, e.event_id, kept)
            }
            state.update(LastSeen(last.get))
            // evict once the key has been quiet past retention (ceil to
            // ms so the timeout can't fire early in event time)
            state.setTimeoutTimestamp(math.max(
              math.floorDiv(last.get + 999L, 1000L)
                + retentionSeconds * 1000L,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Keyed upsert sink for a stream: every micro-batch is deduplicated to
    * one row per key (deterministic last-write-wins on `versionCols`) and
    * merged into the JDBC table — the streaming face of the reference's
    * `REPLACE INTO` ETL (SURVEY §2.1 S5). Idempotent under micro-batch
    * REPLAY (re-running a batch rewrites the same rows), which is the
    * failure mode of checkpointed streaming. Note the contract boundary:
    * version ordering is enforced only WITHIN a batch — if the source can
    * deliver an older version in a LATER batch (producer-side duplicates
    * rather than offset replay), the unconditional MERGE regresses that
    * key; guard it with a version predicate in the target DB (`WHEN
    * MATCHED AND v.version > t.version`) for such sources.
    * Attach `.trigger(...)/.start()` on the returned writer. */
  def upsertSink[T](stream: Dataset[T], url: String, table: String,
      keyCols: Seq[String], versionCols: Seq[String],
      dialect: JdbcUpsert.Dialect,
      batchSize: Int = 500): DataStreamWriter[T] =
    stream.writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[T], _: Long) =>
        val df = batch.toDF()
        JdbcUpsert.upsert(
          JdbcUpsert.dedupLastWins(df, keyCols, versionCols),
          url, table, keyCols, dialect, batchSize)
      }

  /** Stream-static enrichment: left-join the event stream to a (batch)
    * dimension table. The static side is re-planned per micro-batch —
    * broadcast when small, so the stream side never shuffles; updates to
    * the underlying dimension files are picked up between batches. */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(dim, keys, "left")

  /** Stream-stream interval join for click→purchase attribution — the
    * streaming face of the batch as-of join (q39): every purchase is
    * paired with the same user's clicks from the preceding `horizon`.
    *
    * Both sides are real streams (not stream-static), so Spark buffers
    * each in keyed state; the time-range predicate is what BOUNDS that
    * state — clicks can be evicted once the watermark passes
    * `click_ts + horizon` (no future purchase can join them), purchases
    * once their own watermark passes. Without the range condition the
    * planner would (rightly) reject the join as unbounded.
    *
    * Semantics note: the batch as-of join picks exactly the LATEST prior
    * click; a streaming join cannot do per-row argmax at join time, so
    * this emits all in-horizon candidate pairs — the standard shape —
    * and the latest-click selection is a downstream windowed max-by (or
    * the batch [[graft.operators.AsOfJoin]] in a lambda view). Inner by
    * design: append-mode outer interval joins emit null rows only after
    * the watermark fully closes, which adds latency without helping
    * attribution. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
      horizon: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val p = purchases.select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    val c = clicks.select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** LEFT OUTER variant of [[attributionJoin]]: purchases with NO
    * in-horizon click still emit — with NULL click columns — once the
    * click-side watermark passes the purchase time (no on-time click can
    * match anymore; the state store evicts the held row and null-extends
    * it). The semantics every funnel/attribution pipeline actually needs:
    * the unconverted rows ARE the signal. Matched pairs emit exactly like
    * the inner join, as both sides arrive. */
  def attributionJoinOuter(purchases: DataFrame, clicks: DataFrame,
      horizon: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val p = purchases.select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    val c = clicks.select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"),
      "left_outer")
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** A closed SCD2 validity interval, the streaming face of
    * [[graft.operators.Scd2.fromChangeLog]]'s output rows (open rows —
    * NULL effective_to — live in state, not the append stream). */
  final case class Scd2Out(user_id: Long, event_type: String,
      effective_from: Timestamp, effective_to: Timestamp, open_id: Long)

  /** The open dimension row per key: tracked attribute, since-when
    * (epoch micros), and the event id that opened it (the tie-break that
    * keeps the history comparable to the batch operator). */
  final case class OpenDim(attr: String, sinceUs: Long, tieId: Long)

  /** SCD type-2 dimension history as a continuously-running stream: each
    * user's tracked attribute (event_type) maintained as ONE open row in
    * keyed state; an arriving observation with a DIFFERENT attribute
    * closes the open interval (emitted) and opens a new one. Closure is
    * data-driven — no timeout: the state IS the live dimension table,
    * one fixed-size row per key, which is exactly what a dimension
    * costs; `NoTimeout` is deliberate, not an oversight. Within a
    * micro-batch, observations apply in (ts, event_id) order — the batch
    * operator's total order — and a row older than the open interval's
    * start (out-of-order beyond the current version) is dropped as late,
    * the streaming-dimension convention. With in-order arrival the
    * emitted set equals the batch operator's closed intervals exactly
    * (the q289 oracle). */
  def scd2Stream(events: Dataset[Event],
      watermarkDelay: String = "30 minutes"): Dataset[Scd2Out] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenDim, Scd2Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[OpenDim]) =>
          val sorted = rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
          val out = Seq.newBuilder[Scd2Out]
          var cur = state.getOption.orNull
          sorted.foreach { e =>
            val t = tsUs(e.ts)
            if (cur == null) cur = OpenDim(e.event_type, t, e.event_id)
            else if (t < cur.sinceUs) () // late beyond the open version
            else if (e.event_type != cur.attr) {
              out += Scd2Out(uid, cur.attr, usTs(cur.sinceUs), usTs(t),
                cur.tieId)
              cur = OpenDim(e.event_type, t, e.event_id)
            } // same attribute: an observation, not a change
          }
          if (cur != null) state.update(cur)
          out.result().iterator
      }
  }

  /** Gap-based sessionization as a continuously-running stream: the
    * streaming twin of the batch lag+cumsum formulation. One
    * [[OpenSession]] per user in state; a session is emitted when a new
    * event arrives more than `gapSeconds` after it ends, or when the
    * event-time timeout fires (watermark passed end+gap with no successor).
    * `session_seq` is continuous across micro-batches and across closed
    * sessions for `seqRetentionSeconds` of inactivity, after which the
    * user's numbering state is evicted (bounded state) and a returning
    * user restarts at 1. */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
      watermarkDelay: String = "30 minutes",
      seqRetentionSeconds: Long = 24 * 3600L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val retentionMs = seqRetentionSeconds * 1000L
    // Spark's timeout clock is millis; ceil so the timeout can never fire
    // BEFORE end+gap in event time (at most ~1 ms late — the emitted set
    // still matches the strict `end + gap < watermark` predicate for any
    // data without sub-millisecond watermark-boundary ties).
    def timeoutMs(endUs: Long): Long = math.floorDiv(endUs + gapUs + 999L, 1000L)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val open = state.get
            if (open.emitted) {
              // retention expired for an already-emitted placeholder:
              // evict it (state stays bounded; a user returning later
              // restarts numbering at 1 — the bounded-memory tradeoff)
              state.remove()
              Iterator.empty
            } else {
              // keep an (emitted) placeholder so sessionSeq stays
              // continuous for this user's NEXT session, with its own
              // retention timeout so it cannot accumulate forever
              state.update(open.copy(emitted = true))
              state.setTimeoutTimestamp(math.max(
                timeoutMs(open.endUs) + retentionMs,
                state.getCurrentWatermarkMs() + 1))
              Iterator.single(SessionOut(userId, open.sessionSeq, open.nEvents,
                usTs(open.startUs), usTs(open.endUs)))
            }
          } else {
            // Within a micro-batch, order by (ts, event_id) — the same total
            // order as the batch operator.
            val sorted = rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
            val closed = Seq.newBuilder[SessionOut]
            var open = state.getOption.orNull
            sorted.foreach { e =>
              val t = tsUs(e.ts)
              if (open == null) {
                open = OpenSession(1L, 1L, t, t)
              } else if (open.emitted) {
                open = OpenSession(open.sessionSeq + 1, 1L, t, t)
              } else if (t - open.endUs > gapUs) {
                closed += SessionOut(userId, open.sessionSeq, open.nEvents,
                  usTs(open.startUs), usTs(open.endUs))
                open = OpenSession(open.sessionSeq + 1, 1L, t, t)
              } else {
                open = open.copy(nEvents = open.nEvents + 1,
                  endUs = math.max(open.endUs, t))
              }
            }
            state.update(open)
            // close by timeout once the watermark passes end + gap; an
            // emitted placeholder keeps its retention timeout instead
            if (!open.emitted) state.setTimeoutTimestamp(timeoutMs(open.endUs))
            closed.result().iterator
          }
      }
  }
}
