package graft
import org.apache.spark.sql.SparkSession

/** Round-3 timing probe for the slow bench rows (idle-machine use). */
object ScratchR3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $name: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("documents", "embeddings").foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_clusters", "dedup_apply", "kg_headers", "kg_node_frame")
    for (i <- 1 to 2; n <- names)
      t(s"${n}_$i")(SparkEntry.queries(n)(spark, sfDir).count())
    System.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
