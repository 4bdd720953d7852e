package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Structured Streaming specs driven through MemoryStream: watermarked
  * windowed aggregation, within-watermark dedup, stateful sessionization.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int): Timestamp =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + minutes * 60000L)

  private def ev(user: Long, id: Long, minutes: Int,
      typ: String = "click", value: Double = 1.0): Event =
    Event(user, id, ts(minutes), typ, Some(value))

  test("hourlyCounts emits finalized windows once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.hourlyCounts(in.toDF(), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 1, 0), ev(1, 2, 30, value = 2.0), ev(2, 3, 61))
      q.processAllAvailable()
      // advance the watermark far past hour 0 and hour 1
      in.addData(ev(9, 99, 300))
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3))).sortBy(_._1.getTime)
      assert(rows.length == 2)
      assert(rows(0) == ((ts(0), 2L, 3.0)))  // hour 0: two events, 1.0+2.0
      assert(rows(1) == ((ts(60), 1L, 1.0))) // hour 1: one event
    } finally q.stop()
  }

  test("dedupEvents drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.dedupEvents(in.toDF(), watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 100, 0), ev(1, 100, 1), ev(1, 101, 2)) // 100 duplicated
      q.processAllAvailable()
      in.addData(ev(1, 100, 3)) // still inside the horizon -> dropped
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getLong(1)).sorted
      assert(ids.toSeq == Seq(100L, 101L))
    } finally q.stop()
  }

  test("debounce carries last-seen state across micro-batches, lag-gap semantics") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    import spark.implicits._
    // 10-minute gap: minute 0 kept; 5 dropped; 12 kept ONLY under
    // last-KEPT semantics — under lag-gap (vs minute 5) it must drop;
    // 30 (batch 2, vs batch 1's minute 12) kept; 35 dropped.
    val q = EventStreams.debounce(in.toDS(), gapUs = 10L * 60 * 1000000)
      .toDF().writeStream.format("memory").queryName("debounce")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 1, 0), ev(1, 2, 5), ev(1, 3, 12))
      q.processAllAvailable()
      in.addData(ev(1, 4, 30), ev(1, 5, 35))
      q.processAllAvailable()
      val verdicts = spark.table("debounce").collect()
        .map(r => r.getLong(2) -> r.getBoolean(3)).toMap
      assert(verdicts == Map(1L -> true, 2L -> false, 3L -> false,
        4L -> true, 5L -> false))
    } finally q.stop()
  }

  test("attributionJoinOuter null-extends unconverted purchases after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStreams.attributionJoinOuter(
        purchases.toDF(), clicks.toDF(), horizon = "30 minutes",
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("attribout")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(1, 10, 0), ev(2, 12, 5))
      purchases.addData(ev(1, 100, 25, typ = "purchase"),
        ev(2, 101, 50, typ = "purchase"))
      q.processAllAvailable()
      // matched pair emits immediately; purchase 101 (no in-horizon
      // click) is HELD — the watermark cannot yet prove a matching
      // click will never arrive
      val early = spark.table("attribout").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(early.toSet == Set((100L, 10L)))
      // advance BOTH watermarks far past purchase 101 → null-extension
      // (different users, so the two closers cannot match each other;
      // closer purchase 102 itself stays pending: ts = watermark anchor)
      clicks.addData(ev(8, 98, 300))
      purchases.addData(ev(9, 102, 300, typ = "purchase"))
      q.processAllAvailable()
      val late = spark.table("attribout").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(late.toSet == Set((100L, 10L), (101L, -1L)),
        s"got ${late.toSeq}")
    } finally q.stop()
  }

  test("scd2Stream closes intervals across micro-batches and drops stale versions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.scd2Stream(in.toDS())
      .toDF().writeStream.format("memory").queryName("scd2s")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: click@0 opens; view@10 closes click [0,10); view stays open
      in.addData(ev(1, 1, 0), ev(1, 2, 10, typ = "view"))
      q.processAllAvailable()
      def rows() = spark.table("scd2s").collect()
        .map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2), r.getTimestamp(3))).toSet
      assert(rows() == Set((1L, "click", ts(0), ts(10))))
      // batch 2: the open `view` row CARRIED ACROSS the batch boundary —
      // another view@20 is an observation (no change); purchase@30 closes
      // view at [10,30); a stale click@5 (older than the open version)
      // is dropped, NOT spliced into history
      in.addData(ev(1, 3, 20, typ = "view"), ev(1, 4, 30, typ = "purchase"),
        ev(1, 5, 5, typ = "click"))
      q.processAllAvailable()
      assert(rows() == Set(
        (1L, "click", ts(0), ts(10)),
        (1L, "view", ts(10), ts(30))))
    } finally q.stop()
  }

  test("attributionJoin pairs purchases with in-horizon clicks, streams both sides") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = EventStreams.attributionJoin(
        purchases.toDF(), clicks.toDF(), horizon = "30 minutes",
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(1, 10, 0), ev(1, 11, 20), ev(2, 12, 5))
      purchases.addData(ev(1, 100, 25, typ = "purchase"),
        ev(2, 101, 50, typ = "purchase"))
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getLong(1), r.getLong(3))).sorted.toSeq
      // purchase 100 (t=25) joins clicks 10 (t=0) and 11 (t=20) — both in
      // the 30-min horizon; purchase 101 (t=50) joins nothing (click 12 at
      // t=5 is 45 min earlier, outside the horizon)
      assert(rows == Seq((100L, 10L), (100L, 11L)))
      // a batch-mode run of the same plan shape gives the same pairs
      val bp = Seq(ev(1, 100, 25, "purchase"), ev(2, 101, 50, "purchase")).toDF()
      val bc = Seq(ev(1, 10, 0), ev(1, 11, 20), ev(2, 12, 5)).toDF()
      val batch = EventStreams.attributionJoin(bp, bc, horizon = "30 minutes")
        .collect().map(r => (r.getLong(1), r.getLong(3))).sorted.toSeq
      assert(batch == rows)
    } finally q.stop()
  }

  test("enrich joins the stream to a static dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val q = EventStreams.enrich(in.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(ev(1, 1, 0), ev(2, 2, 1), ev(3, 3, 2)) // user 3 unknown
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .collect().map(r => (r.getLong(0), Option(r.getString(5)))).sortBy(_._1)
      assert(rows.toSeq == Seq((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
    } finally q.stop()
  }

  test("upsertSink: streamed micro-batches upsert idempotently into Derby") {
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graftstream;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE user_state (user_id BIGINT PRIMARY KEY, event_id BIGINT, value DOUBLE)")
    conn.close()

    val in = MemoryStream[Event]
    val q = graft.streaming.EventStreams.upsertSink(
        in.toDS().select($"user_id", $"event_id", $"value").as[(Long, Long, Double)],
        url, "user_state", Seq("user_id"), Seq("event_id"),
        graft.sources.JdbcUpsert.DerbyMerge)
      .start()
    try {
      // batch 1: two users; user 1 twice -> event_id 2 wins within batch
      in.addData(ev(1, 1, 0, value = 10.0), ev(1, 2, 1, value = 20.0),
        ev(2, 3, 0, value = 5.0))
      q.processAllAvailable()
      // batch 2: update user 2, insert user 3
      in.addData(ev(2, 4, 2, value = 7.0), ev(3, 5, 2, value = 1.0))
      q.processAllAvailable()

      val check = java.sql.DriverManager.getConnection(url)
      val rs = check.createStatement().executeQuery(
        "SELECT user_id, event_id, value FROM user_state ORDER BY user_id")
      val got = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toList
      check.close()
      assert(got == List((1L, 2L, 20.0), (2L, 4L, 7.0), (3L, 5L, 1.0)))
    } finally q.stop()
  }

  test("sessionize matches batch gap semantics and closes by timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS(), gapSeconds = 1800,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: events at 0 and 10min (one session), then 90min (gap 80min
      // > 30min -> new session); user 2: single event
      in.addData(ev(1, 1, 0), ev(1, 2, 10), ev(2, 10, 0))
      q.processAllAvailable()
      in.addData(ev(1, 3, 90))
      q.processAllAvailable()
      // watermark jump: closes every open session via event-time timeout
      in.addData(ev(9, 99, 600))
      q.processAllAvailable()
      in.addData(ev(9, 98, 1200))
      q.processAllAvailable()

      // a new event AFTER user 1's sessions were closed by timeout: the
      // numbering must continue (session 3), not restart at 1
      in.addData(ev(1, 4, 1300))
      q.processAllAvailable()
      in.addData(ev(9, 97, 2000))
      q.processAllAvailable()

      val rows = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
      // (user, session_seq, n_events); user 9's own session may also close
      val u12 = rows.filter(t => t._1 == 1L || t._1 == 2L)
      assert(u12.toSeq ==
        Seq((1L, 1L, 2L), (1L, 2L, 1L), (1L, 3L, 1L), (2L, 1L, 1L)))

      // parity with the batch operator on the same events
      val batch = graft.operators.Sessionize.sessions(
        Seq(ev(1, 1, 0), ev(1, 2, 10), ev(2, 10, 0), ev(1, 3, 90),
          ev(1, 4, 1300)).toDF(),
        "user_id", "ts", "event_id", 1800L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch == u12.toSeq)
    } finally q.stop()
  }

  test("hllDailyRegisters: streamed registers equal the batch sketch exactly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.hllDailyRegisters(in.toDF(), "user_id",
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("hllregs")
      .outputMode(OutputMode.Append).start()
    try {
      // day 0: users 1,2,3 (user 1 twice — must collapse in the max);
      // then advance the watermark past day 0 to close the window
      in.addData(ev(1, 1, 0), ev(2, 2, 30), ev(3, 3, 60), ev(1, 4, 90))
      q.processAllAvailable()
      in.addData(ev(9, 99, 26 * 60))   // next day, closes day 0
      q.processAllAvailable()
      val streamed = spark.table("hllregs").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getInt(2))).sorted
      val batch = graft.operators.Hll.sketch(
          Seq(ev(1, 1, 0), ev(2, 2, 30), ev(3, 3, 60), ev(1, 4, 90)).toDF()
            .selectExpr("CAST(ts AS DATE) AS day", "user_id"),
          Seq("day"), "user_id")
        .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getInt(2)))
        .sorted
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("cmsDailyCells: streamed counter grid equals the batch sketch exactly") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams.cmsDailyCells(in.toDF(), "user_id",
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("cmscells")
      .outputMode(OutputMode.Append).start()
    try {
      // day 0: user 1 three times, user 2 once — counts must survive into
      // the grid; then advance the watermark past day 0 to close it
      val day0 = Seq(ev(1, 1, 0), ev(1, 2, 30), ev(2, 3, 60), ev(1, 4, 90))
      in.addData(day0: _*)
      q.processAllAvailable()
      in.addData(ev(9, 99, 26 * 60))
      q.processAllAvailable()
      val streamed = spark.table("cmscells")
        .selectExpr("r", "c", "cnt").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
      val batch = graft.operators.Cms.sketch(
          day0.toDF().selectExpr("user_id"), "user_id")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
      assert(streamed.toSeq == batch.toSeq)
      // total mass: d entries per event
      assert(streamed.map(_._3).sum == 4L * graft.operators.Cms.D)
    } finally q.stop()
  }

  /** The kill-restart matrix runs each recovery scenario on BOTH state
    * store providers: the default HDFS-backed in-memory map, and
    * RocksDB — the provider a 100 TB-state production deployment runs
    * (state no longer bounded by executor heap), whose serialization
    * round-trip is a different code path than the in-memory map (values
    * live as RocksDB byte[] rows, so custom state like the graft_topk
    * heap must survive encode → RocksDB → decode, not just object
    * retention). A newSession() isolates the conf flip: the provider
    * class is read at query start, and the streams below run wholly on
    * the parameterized session. */
  private def providerSessions: Seq[(String, () => org.apache.spark.sql.SparkSession)] = Seq(
    "default provider" -> (() => spark),
    "RocksDB provider" -> { () =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s2
    })

  for ((provName, mkSession) <- providerSessions)
  test(s"dedupEvents recovers exactly-once state across a mid-stream restart ($provName)") {
    val s = mkSession()
    // The recovery property a real pipeline depends on: kill a
    // checkpointed query partway through its input, restart it from the
    // same checkpoint against MORE files (all byte-duplicates of already
    // processed events plus genuinely new ones), and the sink must hold
    // each event_id exactly once — offsets recovered (processed files not
    // re-emitted), dedup state recovered (old keys still dropped), new
    // data processed.
    val work = java.nio.file.Files
      .createTempDirectory("graft-restart-").toString
    val base = (1 to 40).map(i => ev(i % 7, i, i))
    base.toDF().repartition(8).write.parquet(s"$work/stage")

    // watermark delay (2h) exceeds the fixture's 45-minute event span:
    // files are hash-partitioned, so early-ts events can arrive AFTER the
    // watermark advanced — a tighter delay would drop them as genuinely
    // late (correct, but then the test measures lateness, not recovery)
    def start() = EventStreams
      .dedupEvents(s.readStream.schema(base.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/stage"),
        "ts", "2 hours")
      .writeStream.format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode(OutputMode.Append)

    // run 1: default trigger, killed from outside once at least one (and
    // at most a few) of the 8 single-file micro-batches has committed —
    // the stop lands at an arbitrary batch boundary, like a crash between
    // commits. (A truly intra-batch kill is not deterministically
    // schedulable from test code; boundary kills are what checkpoint
    // recovery is defined over.)
    val q1 = start().start()
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    assert(q1.recentProgress.nonEmpty, "query made no progress before kill")

    // between the runs: a full duplicate copy of the corpus (every event
    // a dup of one either already processed or still pending) plus 5 new
    // events, landing as new files the restarted query must pick up
    val extra = (41 to 45).map(i => ev(i % 7, i, i))
    (base ++ extra).toDF().repartition(4)
      .write.mode("append").parquet(s"$work/stage")

    // run 2: same checkpoint, drain everything
    val q2 = start().trigger(
      org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()

    val ids = spark.read.parquet(s"$work/out")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 45L),
      s"expected each event exactly once, got ${ids.length} rows")
  }

  for ((provName, mkSession) <- providerSessions)
  test(s"graft_topk serialized heap state survives a checkpointed restart ($provName)") {
    val s = mkSession()
    // The property that distinguishes a real TypedImperativeAggregate
    // streaming story from a demo: the bounded heap IS the state-store
    // row, so after a mid-day kill the restarted query must restore the
    // serialized heap from the checkpoint and MERGE later arrivals into
    // it. The fixture forces that merge to matter: day-0 events are
    // split so the strongest ordinate (id 13, value 22) only arrives
    // AFTER the restart while runners-up (ids 3, 16) arrive before it —
    // both restored and post-restart values must survive into the top-3.
    import org.apache.spark.sql.functions.{col, expr, posexplode, window}
    val work = java.nio.file.Files
      .createTempDirectory("graft-topk-restart-").toString
    def mk(r: Range) = r.map(i =>
      ev(i % 5, i, i * 3, value = (i * 7 % 23).toDouble))
    val stage1 = mk(1 to 12)            // runner-up 21.0 (id 3) pre-kill
    val stage2 = mk(13 to 24)           // 22.0 (id 13), 20.0 (id 16) post
    // day-2 closer: pushes the watermark (2h delay) past day 0's end
    val closer = Seq(ev(9, 99, 27 * 60))
    stage1.toDF().repartition(6).write.parquet(s"$work/stage")

    def start() = s.readStream.schema(stage1.toDF().schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/stage")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day"))
      .agg(expr("graft_topk(value, event_id, 3)").as("tk"))
      .select(col("window.start").cast("date").as("day"), col("tk"))
      .writeStream.format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode(OutputMode.Append)

    // run 1: killed at a batch boundary once ≥1 micro-batch committed —
    // a partially-built day-0 heap is now serialized in the state store
    val q1 = start().start()
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    assert(q1.recentProgress.nonEmpty, "query made no progress before kill")

    // run 2: the rest of day 0 ONLY (the closer ships separately below —
    // inside one run the file source orders batches by mtime, so a
    // same-batch-group closer could advance the watermark past day 0
    // before the last day-0 file, turning real events into late data)
    stage2.toDF().repartition(3).write.mode("append").parquet(s"$work/stage")
    val q2 = start().trigger(
      org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()

    // run 3 — a SECOND restart: only now does the day-2 closer arrive,
    // advancing the watermark past day 0 and flushing its (restored,
    // twice-recovered, fully merged) heap to the sink
    closer.toDF().coalesce(1).write.mode("append").parquet(s"$work/stage")
    val q3 = start().trigger(
      org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q3.awaitTermination()

    val rows = spark.read.parquet(s"$work/out")
      .select(col("day"), posexplode(col("tk")))
      .select(col("day"), (col("pos") + 1).as("rnk"),
        col("col.key").as("event_id"), col("col.ord").as("value"))
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getDouble(3))).sortBy(t => (t._1, t._2))
    // only day 0 closed (the closer's own day is still pending); its
    // top-3 over the FULL 24 events: values are i*7 mod 23 -> strongest
    // 22 (i=13, post-restart), 21 (i=3, pre-kill), 20 (i=16, post)
    assert(rows.toSeq == Seq(
      ("2024-01-01", 1, 13L, 22.0),
      ("2024-01-01", 2, 3L, 21.0),
      ("2024-01-01", 3, 16L, 20.0)),
      s"restored+merged heap produced: ${rows.mkString(", ")}")
  }
}
