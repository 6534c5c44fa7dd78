package graft.util

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** HOST-DRIFT-IMMUNE bench metrics. Two consecutive rounds burned
  * triage proving wall-clock regressions were co-tenant machine noise
  * (same-binary reruns drifted 80→110 s with empty plan diffs —
  * SCALE.md). Wall time cannot be the only signal, so the bench also
  * records, per query, metrics that are DETERMINISTIC at a fixed SF
  * and move only when the physical plan or the data moves:
  *
  *  - `tasks` — tasks executed (partition counts × stages; a new
  *    exchange or a changed partitioning moves it),
  *  - `shuffle_bytes` — shuffle bytes WRITTEN (a new/wider shuffle
  *    moves it; the single biggest scale-killer signal).
  *
  * The triage rule (SCALE.md): flag a bench regression only if
  * `tasks` or `shuffle_bytes` moved too; a seconds-only move on an
  * unchanged plan digest is host noise. Collection is one listener +
  * a bus drain between queries ([[org.apache.spark.graftbridge
  * .ListenerDrain]]), so the snapshot is exact, not sampled. */
final class StableMetrics extends SparkListener {
  private val taskCount = new java.util.concurrent.atomic.AtomicLong
  private val shuffleWrite = new java.util.concurrent.atomic.AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    taskCount.incrementAndGet()
    val m = t.taskMetrics
    if (m != null) {
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten); ()
    }
  }

  def reset(): Unit = { taskCount.set(0L); shuffleWrite.set(0L) }
  def snapshot: (Long, Long) = (taskCount.get(), shuffleWrite.get())
}

object StableMetrics {

  /** Run `body` with an exact task/shuffle accounting: registers a
    * fresh listener, drains the bus before and after so concurrent
    * stragglers from earlier work are excluded and in-flight events
    * are included, and detaches the listener. Returns
    * (tasks, shuffleBytesWritten, bodyResult). */
  def measure[A](spark: SparkSession)(body: => A): (Long, Long, A) = {
    val sc = spark.sparkContext
    org.apache.spark.graftbridge.ListenerDrain.drain(sc)
    val l = new StableMetrics
    sc.addSparkListener(l)
    try {
      val a = body
      org.apache.spark.graftbridge.ListenerDrain.drain(sc)
      val (t, s) = l.snapshot
      (t, s, a)
    } finally sc.removeSparkListener(l)
  }
}
