package graft

/** Round-8 runtime-plan probes (not a driver surface).
  *
  * 1. `TextOps.lmScore` scan count (VERDICT r7 #3 done-condition): the
  *    RETURNED plan must pay exactly TWO corpus scans — bigram-model
  *    training + scoring. The third (unigram-model) scan is paid once,
  *    eagerly, at call time, and re-enters the plan as a LocalRelation
  *    (so it must NOT appear as a parquet scan here). Before the fix the
  *    plan showed three parquet scans (unigram side recomputed) plus the
  *    eager V scan = four.
  * 2. `DedupOps.selfNgramDedup/Spans` shape: two corpus scans (df branch
  *    + join-probe branch), hash joins only — no cartesian/BNL — and
  *    map-side partial aggregation on both the gram-df and the per-doc
  *    re-agg.
  */
object ScratchR8 {
  private def report(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val qe = df.queryExecution
    val n = qe.executedPlan.execute().count()
    // AQE's toString appends the pre-execution "== Initial Plan ==" section,
    // which would double every node count — keep the final plan only
    val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
    def c(s: String) = plan.linesIterator.count(_.contains(s))
    println(s"$name rows=$n parquetScans=${c("Scan parquet")} " +
      s"localRelations=${c("LocalTableScan")} " +
      s"bnlOrCartesian=${c("BroadcastNestedLoop") + c("CartesianProduct")} " +
      s"partialAggs=${c("partial_")} " +
      s"smj=${c("SortMergeJoin")} shj=${c("ShuffledHashJoin")} bhj=${c("BroadcastHashJoin")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = BenchPipeline.newSession(8)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    report("LM_SCORE", graft.ops.TextOps.lmScore(docs))
    report("SELFGRAM", graft.ops.DedupOps.selfNgramDedup(docs, n = 8))
    report("SELFGRAM_SPANS", graft.ops.DedupOps.selfNgramSpans(docs, n = 8))
    Runtime.getRuntime.halt(0)
  }
}
