package graft.core

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shuffle/spill accounting per measured region — the scale diagnostic
  * behind the plan-shape claims: a query whose plan "minimizes
  * shuffles" should show it in bytes, and a regression that adds an
  * exchange shows up as a shuffle-volume jump even when wall time hides
  * in host noise. Register once per session; `measure` snapshots the
  * counters around a thunk and drains the listener bus before reading
  * (task events are delivered asynchronously). */
final class ShuffleTally extends SparkListener {
  private val shuffleWrite = new AtomicLong
  private val shuffleRead = new AtomicLong
  private val spilled = new AtomicLong

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  final case class Delta(shuffleWriteBytes: Long, shuffleReadBytes: Long,
                         spilledBytes: Long)

  def measure[A](sc: SparkContext)(thunk: => A): (A, Delta) = {
    org.apache.spark.GraftListenerBridge.waitUntilEmpty(sc)
    val w0 = shuffleWrite.get; val r0 = shuffleRead.get
    val s0 = spilled.get
    val out = thunk
    org.apache.spark.GraftListenerBridge.waitUntilEmpty(sc)
    (out, Delta(shuffleWrite.get - w0, shuffleRead.get - r0,
      spilled.get - s0))
  }
}

object ShuffleTally {
  /** Install a tally on the session's listener bus. */
  def install(sc: SparkContext): ShuffleTally = {
    val t = new ShuffleTally
    sc.addSparkListener(t)
    t
  }
}
