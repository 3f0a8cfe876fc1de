package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Shared task-metrics listener for the measurement mains (ScaleBench,
  * SkewBench): per-task maxima (the "would one task OOM/straggle"
  * signal) plus job totals (the "did the shuffle volume actually scale"
  * signal). Register once per session; `reset()` between queries.
  *
  * Listener events post asynchronously and the bus-drain API is
  * private[spark] — callers pause briefly (~300 ms in local mode) after
  * an action before reading the fields.
  */
private[graft] class TaskMetricsProbe extends SparkListener {
  @volatile var maxTaskMs = 0L
  @volatile var maxShuffleRead = 0L
  @volatile var maxShuffleWrite = 0L
  @volatile var maxPeakMem = 0L
  @volatile var totShuffleWrite = 0L
  @volatile var totInput = 0L
  @volatile var totRecords = 0L
  @volatile var tasks = 0

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
    if (t.taskInfo != null) maxTaskMs = maxTaskMs.max(t.taskInfo.duration)
    val m = t.taskMetrics
    if (m != null) {
      maxShuffleRead = maxShuffleRead.max(m.shuffleReadMetrics.totalBytesRead)
      maxShuffleWrite = maxShuffleWrite.max(m.shuffleWriteMetrics.bytesWritten)
      maxPeakMem = maxPeakMem.max(m.peakExecutionMemory)
      totShuffleWrite += m.shuffleWriteMetrics.bytesWritten
      totInput += m.inputMetrics.bytesRead
      totRecords += m.inputMetrics.recordsRead
    }
    tasks += 1
  }

  def reset(): Unit = synchronized {
    maxTaskMs = 0L; maxShuffleRead = 0L; maxShuffleWrite = 0L
    maxPeakMem = 0L; totShuffleWrite = 0L; totInput = 0L; totRecords = 0L
    tasks = 0
  }
}
