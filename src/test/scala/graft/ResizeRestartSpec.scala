package graft

import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Cluster-resize recovery: a checkpointed streaming query restarted on a
  * session with a DIFFERENT `spark.sql.shuffle.partitions` must continue
  * exactly — the state operator's partitioning is pinned in the
  * checkpoint's offset metadata at first start, not re-read from the new
  * session, so state rows keep hashing to the partition that owns them. A
  * real 100 TB pipeline hits this every time the cluster is resized
  * between restarts; a query whose dedup state silently re-hashed would
  * re-emit (or drop) events near the partition boundaries. Run on both
  * state-store providers, matching StreamingSpec's kill-restart matrix.
  */
class ResizeRestartSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.EventStreams.Event

  private def ev(user: Long, id: Long, minutes: Int) =
    Event(user, id, new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        + minutes * 60000L), "click", Some(1.0))

  private val providers = Seq(
    "default provider" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "RocksDB provider" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  for ((provName, provClass) <- providers)
  test(s"dedup state survives a shuffle-partition resize across restart ($provName)") {
    val work = java.nio.file.Files
      .createTempDirectory("graft-resize-").toString
    val base = (1 to 40).map(i => ev(i % 7, i, i)).toDF()
    base.repartition(8).write.parquet(s"$work/stage")

    def start(s: org.apache.spark.sql.SparkSession) = streaming.EventStreams
      .dedupEvents(s.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/stage"),
        "ts", "2 hours")
      .writeStream.format("parquet").option("path", s"$work/out")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode(OutputMode.Append)

    // run 1 at the suite's 4 shuffle partitions — this bakes 4 state
    // partitions into the checkpoint
    val s1 = spark.newSession()
    s1.conf.set("spark.sql.streaming.stateStore.providerClass", provClass)
    val q1 = start(s1).start()
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop()
    assert(q1.recentProgress.nonEmpty, "query made no progress before kill")

    // the "resized cluster": duplicates of everything plus 5 new events,
    // then restart from the same checkpoint on a 7-partition session (7 is
    // co-prime with 4, so EVERY key would re-hash if the new session's
    // conf leaked into the state operator)
    val extra = (41 to 45).map(i => ev(i % 7, i, i))
    ((1 to 40).map(i => ev(i % 7, i, i)) ++ extra).toDF()
      .repartition(4).write.mode("append").parquet(s"$work/stage")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass", provClass)
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    val q2 = start(s2).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()

    val ids = spark.read.parquet(s"$work/out")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 45L),
      s"expected each event exactly once after resize, got ${ids.length} rows")
  }
}
