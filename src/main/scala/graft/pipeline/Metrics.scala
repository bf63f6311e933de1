package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** APM analogue (reference: the `apm` feature exporting traces/metrics):
  * a SparkListener aggregating task/stage counters that a metrics exporter
  * can scrape. Spark already carries the observability spine (listeners,
  * SQL metrics, event logs); this surfaces the pipeline-level counters the
  * reference exposes.
  */
final class QueryMetricsListener extends SparkListener {
  val tasksCompleted = new LongAdder
  val stagesCompleted = new LongAdder
  val recordsRead = new LongAdder
  val recordsWritten = new LongAdder
  val bytesRead = new LongAdder
  val shuffleBytesWritten = new LongAdder
  val peakExecutionMemory = new AtomicLong(0)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    tasksCompleted.increment()
    val m = taskEnd.taskMetrics
    if (m != null) {
      recordsRead.add(m.inputMetrics.recordsRead)
      recordsWritten.add(m.outputMetrics.recordsWritten)
      bytesRead.add(m.inputMetrics.bytesRead)
      shuffleBytesWritten.add(m.shuffleWriteMetrics.bytesWritten)
      peakExecutionMemory.accumulateAndGet(m.peakExecutionMemory, math.max)
    }
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
    stagesCompleted.increment()

  def snapshot: Map[String, Long] = Map(
    "tasks_completed" -> tasksCompleted.sum(),
    "stages_completed" -> stagesCompleted.sum(),
    "records_read" -> recordsRead.sum(),
    "records_written" -> recordsWritten.sum(),
    "bytes_read" -> bytesRead.sum(),
    "shuffle_bytes_written" -> shuffleBytesWritten.sum(),
    "peak_execution_memory" -> peakExecutionMemory.get())
}

object QueryMetricsListener {
  /** Attach a fresh listener to the session. */
  def attach(spark: SparkSession): QueryMetricsListener = {
    val l = new QueryMetricsListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
