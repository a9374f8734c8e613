package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing probe (not part of the driver contract). */
object Scratch {
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
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("emb_count")(emb.count())
    t("head_q")(emb.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0).length)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    t("cosine_1st")(graft.ops.AnnOps.cosineTopK(emb, q, 0L, 10).count())
    t("cosine_2nd")(graft.ops.AnnOps.cosineTopK(emb, q, 0L, 10).count())
    t("full_query_1st")(SparkEntry.queries("ann_cosine_topk")(spark, sfDir).count())
    t("full_query_2nd")(SparkEntry.queries("ann_cosine_topk")(spark, sfDir).count())
    val docsT = spark.read.parquet(s"$sfDir/documents.parquet")
    val allSh = graft.ops.DedupOps.shingles(docsT, 2)
      .select(col("doc_id"), expr("conv(substring(md5(encode(shingle,'UTF-8')),1,14),16,10)").cast("long").as("shingle"))
    t("allsh_count")(allSh.count())
    t("allsh_count2")(allSh.count())
    t("jaccard")(SparkEntry.queries("dedup_jaccard")(spark, sfDir).count())
    t("jaccard2")(SparkEntry.queries("dedup_jaccard")(spark, sfDir).count())
    t("lsh_cand")(SparkEntry.queries("dedup_lsh_candidates")(spark, sfDir).count())
    t("minhash")(SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count())
    t("ivf_topk")(SparkEntry.queries("ann_ivf_topk")(spark, sfDir).count())
    t("ivf_hist")(SparkEntry.queries("ann_ivf_hist")(spark, sfDir).count())
    t("clusters")(SparkEntry.queries("dedup_clusters")(spark, sfDir).count())
    SparkEntry.queries("ann_cosine_topk")(spark, sfDir).explain("formatted")
    Runtime.getRuntime.halt(0)
  }
}
