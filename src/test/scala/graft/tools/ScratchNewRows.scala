package graft

/** One-off timing probe for newly added SparkEntry rows at a given sf dir
  * (not a driver surface). args = sfDir queryName...
  */
object ScratchNewRows {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("sample_pack", "text_lm_score", "kg_triples_fused")
    val spark = BenchPipeline.newSession(32)
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (rep <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"T rep$rep $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    Runtime.getRuntime.halt(0)
  }
}
