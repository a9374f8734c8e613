package graft

import graft.corpus.{AnalyticsDomain, Corpus}

/** Plan probe (not part of the driver contract): prints the AQE-final
  * executed plan of [[KgPipeline.triplesFromSets]] to verify the shared
  * combiner exchange is planned once (ReusedExchange/ReusedStage present;
  * exactly one MapPartitions over the cache for the rank+pair families).
  */
object ScratchFusedPlan {
  def main(args: Array[String]): Unit = {
    val spark = BenchPipeline.newSession(4)
    val docs = Corpus.synthesize(spark, 2000, AnalyticsDomain.vocab)
    val pipe = KgPipeline.analytics(spark)
    val ms = pipe.mentionSets(docs).persist()
    ms.count()
    val ts = pipe.triplesFromSets(ms)
    // execute THIS QueryExecution (count() would plan a separate one), so
    // the printed AdaptiveSparkPlan is the final runtime plan with any
    // stage reuse visible
    val qe = ts.queryExecution
    val n = qe.executedPlan.execute().count()
    println(s"TRIPLES=$n")
    val plan = qe.executedPlan.toString
    println(plan)
    val reused = plan.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("ReusedQueryStage") || l.contains("reuses"))
    val shuffles = plan.linesIterator.count(_.contains("ShuffleQueryStage"))
    println(s"SUMMARY reusedMarkers=$reused shuffleStages=$shuffles")
    // group the shuffle exchanges by canonicalized plan: same-canonical
    // exchanges should have been reused. The stages live inside the
    // adaptive plan, so pull the current physical plan via reflection.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    val finalPlan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        val f = a.getClass.getDeclaredFields.find(_.getName.endsWith("currentPhysicalPlan"))
        f.foreach(_.setAccessible(true))
        f.map(_.get(a).asInstanceOf[SparkPlan]).getOrElse(a)
      case p => p
    }
    val stages = finalPlan.collectWithSubqueries { case s: ShuffleQueryStageExec => s }
    println(s"CANON stages=${stages.size}")
    val kStages = stages.filter(_.plan.toString.contains("hashpartitioning(k#"))
    for (i <- kStages.indices; j <- kStages.indices if i < j)
      println(s"SAMERESULT $i~$j = ${kStages(i).plan.sameResult(kStages(j).plan)}")
    if (kStages.size >= 2) {
      println("CANON0:\n" + kStages(0).plan.canonicalized.toString.take(3000))
      println("CANON1:\n" + kStages(1).plan.canonicalized.toString.take(3000))
    }
    Runtime.getRuntime.halt(0)
  }
}
