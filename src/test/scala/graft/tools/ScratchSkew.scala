package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.corpus.{AnalyticsDomain, Corpus}

/** Hub-entity skew evidence probe (VERDICT r5 #3, not a driver surface):
  * runs the FUSED pipeline over a geometrically hub-skewed corpus (head
  * dictionary entity in ~50% of all docs) at one parallelism level, with a
  * task-duration listener, and reports
  *   - the triple count (compared across levels / against the string path
  *     by the caller),
  *   - per-stage max/median task duration for every stage with >= 8 tasks —
  *     the straggler criterion is max <= 4x median.
  * args = (cores, nDocs[, alsoString]).
  */
object ScratchSkew {

  // the listener/report/input machinery moved to main scope (r8) so the
  // official bench line can run the skew leg itself (graft.BenchSkew);
  // this probe keeps the richer interactive output on the shared code
  type TaskStats = BenchSkew.TaskStats
  def stageSkewReport(stats: TaskStats, minTasks: Int = 8): Seq[(Int, Int, Long, Long, Double)] =
    BenchSkew.stageSkewReport(stats, minTasks)
  def ensureSkewedInput(spark: SparkSession, nDocs: Long): String =
    BenchSkew.ensureSkewedInput(spark, nDocs)

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val alsoString = args.length > 2 && args(2) == "string"
    val spark = BenchPipeline.newSession(cores)
    import spark.implicits._
    val dir = ensureSkewedInput(spark, nDocs)
    val docs = spark.read.parquet(dir).as[graft.model.Doc]
    val pipe = KgPipeline.analytics(spark)
    // warm-up (unlistened)
    BenchPipeline.pipelineRun(spark, 2000)

    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    val t0 = System.nanoTime()
    val (ns, es, ts) = pipe.runFused(docs)
    val _ = (ns, es)
    val nTriples = ts.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.sharedState.cacheManager.clearCache()
    Thread.sleep(500) // let listener drain
    println(f"SKEW fused cores=$cores docs=$nDocs sec=$sec%.2f triples=$nTriples")
    val rep = stageSkewReport(stats)
    rep.foreach { case (sid, n, med, mx, r) =>
      println(f"SKEWSTAGE stage=$sid tasks=$n med_ms=$med max_ms=$mx ratio=$r%.2f")
    }
    // headline straggler ratio counts only stages whose slowest task is
    // itself significant (>= 500 ms): a 3 ms-median stage with a 200 ms max
    // is first-task scheduling/codegen jitter, not data skew
    val big = rep.filter(_._4 >= 500)
    println(f"SKEWMAXRATIO ${big.map(_._5).maxOption.getOrElse(1.0)}%.2f (over ${big.size} stages with max>=500ms; all-stage max ${rep.map(_._5).maxOption.getOrElse(1.0)}%.2f)")
    if (alsoString) {
      val t1 = System.nanoTime()
      val (_, _, ts2) = pipe.run(docs)
      val n2 = ts2.count()
      println(f"SKEW string cores=$cores docs=$nDocs sec=${(System.nanoTime() - t1) / 1e9}%.2f triples=$n2 equal=${n2 == nTriples}")
    }
    System.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
