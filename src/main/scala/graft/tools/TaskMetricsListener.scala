package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Cumulative task-metric counters for the bench harness: shuffle
  * read/write bytes, spill, and scan input bytes/records, summed over
  * every completed task since registration. `Bench` snapshots the
  * counters around each timed query and records the DELTA per query in
  * `target/bench.json` (`queries_metrics`), so shuffle discipline is a
  * measured per-round artifact instead of a plan-shape argument: a
  * query whose map-side combine stops combining, whose broadcast join
  * degrades to a shuffle, or whose scan stops pruning columns moves
  * these numbers round-over-round even when wall-clock noise hides it.
  *
  * Listener-bus delivery is asynchronous (there is no public
  * wait-until-empty), so [[settledSnapshot]] polls until two reads
  * observe the same totals — after an action returns, all its tasks
  * have ended and only bus dispatch lags, so a stable double-read is a
  * complete one. Counters are [[LongAdder]]s: the bus posts from its
  * own dispatch thread while the bench thread reads.
  */
final class TaskMetricsListener extends SparkListener {
  private val shuffleReadBytes = new LongAdder
  private val shuffleWriteBytes = new LongAdder
  private val shuffleRecordsWritten = new LongAdder
  private val memorySpilled = new LongAdder
  private val diskSpilled = new LongAdder
  private val inputBytes = new LongAdder
  private val inputRecords = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
      shuffleRecordsWritten.add(m.shuffleWriteMetrics.recordsWritten)
      memorySpilled.add(m.memoryBytesSpilled)
      diskSpilled.add(m.diskBytesSpilled)
      inputBytes.add(m.inputMetrics.bytesRead)
      inputRecords.add(m.inputMetrics.recordsRead)
    }
  }

  /** Current totals. Key names are the bench-artifact field names. */
  def snapshot: Map[String, Long] = Map(
    "shuf_read" -> shuffleReadBytes.sum(),
    "shuf_write" -> shuffleWriteBytes.sum(),
    "shuf_recs" -> shuffleRecordsWritten.sum(),
    "spill_mem" -> memorySpilled.sum(),
    "spill_disk" -> diskSpilled.sum(),
    "input_bytes" -> inputBytes.sum(),
    "input_recs" -> inputRecords.sum())

  /** Snapshot after the listener bus drains: poll until two consecutive
    * reads agree (bounded at ~`maxWaitMs`; if the bus is still moving at
    * the bound — some unrelated stream posting events — return the last
    * read rather than hang the bench). */
  def settledSnapshot(maxWaitMs: Long = 2000): Map[String, Long] = {
    var prev = snapshot
    var waited = 0L
    while (waited < maxWaitMs) {
      Thread.sleep(25)
      waited += 25
      val cur = snapshot
      if (cur == prev) return cur
      prev = cur
    }
    prev
  }

  /** Element-wise delta of two snapshots (after - before). */
  def delta(before: Map[String, Long], after: Map[String, Long]): Map[String, Long] =
    after.map { case (k, v) => k -> (v - before.getOrElse(k, 0L)) }
}
