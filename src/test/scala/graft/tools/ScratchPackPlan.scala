package graft

/** Runtime-plan probe for SampleOps.packSequences (not a driver surface):
  * executes the exact QueryExecution and reports whether AQE reused the
  * range exchange shared by the partials branch and the main branch.
  */
object ScratchPackPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = BenchPipeline.newSession(8)
    val out = graft.ops.SampleOps.packSequences(
      spark.read.parquet(s"$dir/documents.parquet"), 512)
    val qe = out.queryExecution
    val n = qe.executedPlan.execute().count()
    val plan = qe.executedPlan.toString
    val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    println(s"PACK rows=$n reusedExchanges=$reused parquetScans=$scans")
    Runtime.getRuntime.halt(0)
  }
}
