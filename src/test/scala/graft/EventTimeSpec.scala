package graft

import org.apache.spark.sql.functions._

import graft.streaming.{BoundedRuns, EventTime}

/** Pins the streaming event-time zone contract in the unit suite (the
  * full-catalog proof is tools/invariance.sh row (f), but that is a
  * 13-minute sweep — this is the fast regression gate for the r8 bug
  * class where streaming twins derived instants from the session-zone-
  * dependent NTZ→LTZ cast). */
class EventTimeSpec extends SparkSpec {

  test("pinIn yields the stored wall clock as a UTC instant in ANY session zone") {
    // 2024-01-01 00:00:00 wall → epoch micros 1704067200000000 iff
    // interpreted as UTC; a leaked Kathmandu interpretation would read
    // 1704046500000000 (−5h45m)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    import s2.implicits._
    val got = Seq("2024-01-01 00:00:00").toDF("w")
      .select(unix_micros(EventTime.pinIn(
        col("w").cast("timestamp_ntz").cast("timestamp"))))
      .head().getLong(0)
    assert(got == 1704067200000000L,
      s"pinned instant drifted with the session zone: $got")
  }

  test("pinOut renders a UTC instant's UTC wall clock in ANY session zone") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    import s2.implicits._
    val got = Seq(1704067200000000L).toDF("us")
      .select(EventTime.pinOut(timestamp_micros(col("us")))
        .cast("timestamp_ntz").cast("string"))
      .head().getString(0)
    assert(got == "2024-01-01 00:00:00",
      s"pinned rendering drifted with the session zone: $got")
  }

  test("a streamed daily twin is bit-identical between UTC and Kathmandu sessions") {
    // End-to-end: the same bounded streaming run (watermarked 1-day
    // windows + the native top-k heap state) on a +05:45 session must
    // emit exactly the UTC session's rows — days, ranks, values.
    def run(s: org.apache.spark.sql.SparkSession): Seq[String] =
      BoundedRuns.streamedDailyTopK(s, sf(), k = 3)
        .collect().map(_.toString).toSeq
    val utc = run(spark)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    val ktm = run(s2)
    assert(utc.nonEmpty, "streamed top-k emitted nothing")
    assert(ktm == utc, "streamed daily top-k drifted with the session zone")
  }
}
