package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}

/** Chaos-kill row of the execution-environment invariance matrix
  * (COVERAGE.md): on task start, kill the FIRST attempt of every third
  * task via `sc.killTaskAttempt`. Killed tasks do not count toward
  * `spark.task.maxFailures` and are rescheduled, so this is exactly the
  * operational event a 100 TB job sees constantly — preemption, executor
  * decommission, speculation losing the race — injected mid-flight with
  * the thread interrupted. The whole oracle sweep must still hash-match:
  * no operator may depend on a task running to completion exactly once,
  * and every writer must commit through the output-commit protocol so a
  * killed attempt's partial output never surfaces.
  *
  * Enabled by `SPARK_GRAFT_CHAOS=kill` on [[graft.Verify]], which fails
  * the sweep if zero kills actually landed (a vacuous chaos row is worse
  * than none — it records an invariance that was never tested).
  *
  * The listener races task completion by design: `killTaskAttempt`
  * returns false for a task that already finished (common for
  * millisecond tasks at sf0.01), and `landed` counts only signals the
  * scheduler accepted.
  */
final class ChaosKillListener(sc: SparkContext) extends SparkListener {
  val attempted = new AtomicLong
  val landed = new AtomicLong

  override def onTaskStart(e: SparkListenerTaskStart): Unit = {
    val info = e.taskInfo
    if (info.attemptNumber == 0 && info.index % 3 == 0) {
      attempted.incrementAndGet()
      val ok =
        try sc.killTaskAttempt(info.taskId, interruptThread = true,
          reason = "graft-chaos: first-attempt kill")
        catch { case _: Throwable => false } // task gone; benign race
      if (ok) landed.incrementAndGet()
    }
  }
}
