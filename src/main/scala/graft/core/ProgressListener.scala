package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Stage/task progress reporting — the Spark-native analog of the
  * reference's mapper→master heartbeat path (2 s progress timers RPC'd
  * per split, `Mapper.h:172-187,327-352`; progress = bytes-consumed ÷
  * split length, `LineRecordReader.h:78-81`; master print loop
  * `MapReduceMaster.cpp:176-183`). Spark already tracks all of this
  * per task; this listener just surfaces it in the reference's
  * "<stage> : <pct>%" shape. Start/Finish lifecycle messages
  * (`Mapper.h:196-217`) map to stage submitted/completed events. */
final class ProgressListener(report: String => Unit) extends SparkListener {
  private val totals = new ConcurrentHashMap[Int, Int]()
  private val done = new ConcurrentHashMap[Int, Int]()

  override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit = {
    totals.put(ev.stageInfo.stageId, ev.stageInfo.numTasks)
    report(s"stage ${ev.stageInfo.stageId} Start (${ev.stageInfo.numTasks} tasks)")
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val stage = ev.stageId
    val d = done.merge(stage, 1, (a, b) => a + b)
    val t = totals.getOrDefault(stage, 0)
    if (t > 0) {
      val pct = 100.0 * d / t
      report(f"stage $stage Process $pct%.2f%%")
    }
  }

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
    report(s"stage ${ev.stageInfo.stageId} Finish")
}

object ProgressListener {
  /** Attach to a session; returns the listener for later removal via
    * `spark.sparkContext.removeSparkListener`. */
  def attach(spark: SparkSession)(report: String => Unit): ProgressListener = {
    val l = new ProgressListener(report)
    spark.sparkContext.addSparkListener(l)
    l
  }
}
