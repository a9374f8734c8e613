package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.LongAdder

/** Task-time accounting probe: one full pipelineRun after warm-ups, with a
  * listener summing executor run/GC time and max task time per run.
  * Distinguishes "per-task work inflates with parallelism" (bandwidth /
  * frequency / GC — a host ceiling) from "wall exceeds task-time / cores"
  * (scheduling gaps, stragglers — an engine defect). args = (cores, nDocs).
  */
object ScratchTasks {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = BenchPipeline.newSession(cores)
    BenchPipeline.pipelineRun(spark, 2000)
    BenchPipeline.pipelineRun(spark, math.max(20000L, nDocs / 20))

    val runTime = new LongAdder; val gcTime = new LongAdder
    val cpuTime = new LongAdder; val maxTask = new java.util.concurrent.atomic.AtomicLong
    val nTasks = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          runTime.add(m.executorRunTime); gcTime.add(m.jvmGCTime)
          cpuTime.add(m.executorCpuTime)
          nTasks.increment()
          maxTask.accumulateAndGet(m.executorRunTime, math.max(_, _))
        }
      }
    })
    val (sec, triples) = BenchPipeline.pipelineRun(spark, nDocs)
    Thread.sleep(500) // listener drain
    val rt = runTime.sum / 1e3; val gc = gcTime.sum / 1e3
    val cpu = cpuTime.sum / 1e9
    println(f"TASKS cores=$cores wall=$sec%.2f taskRun=$rt%.1f cpu=$cpu%.1f gc=$gc%.2f " +
      f"maxTask=${maxTask.get / 1e3}%.2f nTasks=${nTasks.sum} " +
      f"sched_gap=${(cores * sec - rt) / (cores * sec) * 100}%.1f%% triples=$triples")
    Runtime.getRuntime.halt(0)
  }
}
