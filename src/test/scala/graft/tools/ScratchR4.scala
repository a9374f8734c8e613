package graft

/** Round-4 timing probe: decompose the IVF family cost at sf0.1
  * (train / index write / hist / topk). Idle-machine use. */
object ScratchR4 {
  def main(args: Array[String]): Unit = {
    val spark = BenchPipeline.newSession(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.out.flush()
    }
    import graft.ops.AnnOps
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println("rows=" + emb.count())
    t("warm")(spark.range(1000000).selectExpr("sum(id)").collect())
    var cents: Array[(Int, Array[Long], Double)] = null
    t("train") { cents = AnnOps.ivfTrainCentroids(emb, 16, 2) }
    t("train2")(AnnOps.ivfTrainCentroids(emb, 16, 2))
    val tmp = java.nio.file.Files.createTempDirectory("ivf-r4-").toString
    t("writeIndex")(AnnOps.writeIvfIndex(emb, cents, tmp))
    t("histFromIndex")(AnnOps.ivfListSizesFromIndex(spark, tmp).count())
    t("assignHist")(AnnOps.ivfListSizes(emb, cents).count())
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    t("topkFromIndex")(AnnOps.ivfTopKFromIndex(spark, tmp, q, 0L, 5).count())
    t("topkAssign")(AnnOps.ivfTopK(emb, cents, q, 0L, 5, 4).count())
    Runtime.getRuntime.halt(0)
  }
}
