package graft

/** Runtime-plan probe for SampleOps.budgetSelect (not a driver surface):
  * executes the exact QueryExecution and reports whether AQE reused the
  * (quality DESC, id) range exchange shared by the partials branch and
  * the main branch — the pre-execution explain cannot show ReusedExchange.
  */
object ScratchBudgetPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = BenchPipeline.newSession(8)
    val out = graft.ops.SampleOps.budgetSelect(
      spark.read.parquet(s"$dir/documents.parquet"), 15000L, "n_chars")
    val qe = out.queryExecution
    val n = qe.executedPlan.execute().count()
    // AQE appends an "== Initial Plan ==" section; split it off (ScratchR8)
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    println(s"BUDGET rows=$n reusedExchanges=$reused parquetScans=$scans")
    Runtime.getRuntime.halt(0)
  }
}
