package graft
import org.apache.spark.sql.SparkSession

/** Round-3 timing probe for the slow bench rows. */
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
    // warmup (same as Bench)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("documents", "embeddings").foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    for (i <- 1 to 2) {
      t(s"kg_headers_$i")(SparkEntry.queries("kg_headers")(spark, sfDir).count())
      t(s"kg_node_frame_$i")(SparkEntry.queries("kg_node_frame")(spark, sfDir).count())
      t(s"dedup_clusters_$i")(SparkEntry.queries("dedup_clusters")(spark, sfDir).count())
      t(s"ann_ivf_hist_$i")(SparkEntry.queries("ann_ivf_hist")(spark, sfDir).count())
      t(s"kg_schema_info_$i")(SparkEntry.queries("kg_schema_info")(spark, sfDir).count())
      t(s"q1_agg_$i")(SparkEntry.queries("q1_agg")(spark, sfDir).count())
    }
    System.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
