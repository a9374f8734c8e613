package graft

/** Runtime-plan probe for SampleOps.shuffleOrder and lengthBatches (not a
  * driver surface): both reuse the packSequences prefix-sum idiom, so both
  * must show AQE reusing the shared range exchange (ONE parquet scan, the
  * bases branch fed by a ReusedExchange) — the same audit ScratchPackPlan
  * runs for packing. Counts are taken on the FINAL adaptive plan only
  * (executedPlan.toString appends an "== Initial Plan ==" section that
  * doubles node counts — the ScratchR8 trap).
  */
object ScratchShufflePlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = BenchPipeline.newSession(8)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for ((name, df) <- Seq(
        "shuffle" -> graft.ops.SampleOps.shuffleOrder(docs),
        "lengthBatches" -> graft.ops.SampleOps.lengthBatches(docs, 8))) {
      val qe = df.queryExecution
      val n = qe.executedPlan.execute().count()
      val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      println(s"$name rows=$n reusedExchanges=$reused parquetScans=$scans")
    }
    Runtime.getRuntime.halt(0)
  }
}
