package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query task-level telemetry for the bench (VERDICT r7 #1): wall-clock
  * alone cannot distinguish "the plan did more work" from "the machine was
  * busy elsewhere" from "the JVM was collecting garbage" from "the hash
  * agg/join spilled". The discriminators, all from `TaskMetrics`:
  *
  *  - `runMs` (sum of executorRunTime): CPU-time actually spent in tasks.
  *    wall ≫ run/cores ⇒ executors sat idle (external contention,
  *    scheduler stall, driver-side planning); run ≈ wall×cores ⇒ the
  *    query really computed that long.
  *  - `gcMs`: JVM GC time attributed to tasks — the heap-pressure signal.
  *  - `memSpill`/`diskSpill` bytes: hash-agg/join/sort spill — the
  *    execution-memory-pressure signal.
  *  - `peakExecMem`: max single-task execution memory — how close the
  *    heaviest operator runs to its memory budget.
  *  - shuffle read/write bytes + task count: plan-shape sanity.
  *
  * Accumulation is atomic because task-end events arrive on the listener
  * bus thread while reset/snapshot run on the main thread; snapshots are
  * taken only after [[ListenerBridge.flush]] drains the bus, so a query's
  * tail tasks cannot leak into the next query's window.
  */
final class BenchMetrics extends SparkListener {
  private val runMs = new AtomicLong
  private val gcMs = new AtomicLong
  private val memSpill = new AtomicLong
  private val diskSpill = new AtomicLong
  private val peakExec = new AtomicLong
  private val shufRead = new AtomicLong
  private val shufWrite = new AtomicLong
  private val tasks = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      runMs.addAndGet(m.executorRunTime)
      gcMs.addAndGet(m.jvmGCTime)
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      peakExec.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      tasks.incrementAndGet()
    }
  }

  def reset(sc: SparkContext): Unit = {
    ListenerBridge.flush(sc)
    Seq(runMs, gcMs, memSpill, diskSpill, peakExec, shufRead, shufWrite,
      tasks).foreach(_.set(0L))
  }

  def snapshot(sc: SparkContext): BenchMetrics.Snap = {
    ListenerBridge.flush(sc)
    BenchMetrics.Snap(runMs.get, gcMs.get, memSpill.get, diskSpill.get,
      peakExec.get, shufRead.get, shufWrite.get, tasks.get)
  }
}

object BenchMetrics {
  final case class Snap(runMs: Long, gcMs: Long, memSpill: Long,
      diskSpill: Long, peakExec: Long, shufRead: Long, shufWrite: Long,
      tasks: Long) {
    private def mb(b: Long): Long = b >> 20
    /** Compact JSON object (no spaces — these lines fight for the
      * driver's 2000-char stdout tail). Times in seconds (3dp), sizes
      * in whole MiB. */
    def json(wallSec: Double): String = {
      def r3(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      s"""{"wall":${r3(wallSec)},"run":${r3(runMs / 1e3)},"gc":${r3(gcMs / 1e3)},""" +
        s""""spill_mb":${mb(memSpill + diskSpill)},"peak_mb":${mb(peakExec)},""" +
        s""""shuf_mb":${mb(shufRead + shufWrite)},"tasks":$tasks}"""
    }
  }
}
