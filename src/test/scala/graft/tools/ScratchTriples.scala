package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.corpus.AnalyticsDomain

/** Branch-level cost probe for [[KgPipeline.triplesFromSets]] (not a driver
  * surface): times each triple family's count alone against the whole
  * union, on the staged bench corpus. args = (cores, nDocs).
  */
object ScratchTriples {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = BenchPipeline.newSession(cores)
    BenchPipeline.pipelineRun(spark, 2000)
    BenchPipeline.pipelineRun(spark, math.max(20000L, nDocs / 20))
    import spark.implicits._

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"T $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    val dir = BenchPipeline.ensureInput(spark, nDocs)
    val docs = spark.read.parquet(dir).as[graft.model.Doc]
    val pipe = KgPipeline.analytics(spark)
    val ms = pipe.mentionSets(docs).persist(StorageLevel.MEMORY_AND_DISK)
    timed("cache_build") { ms.count() }

    val ts = pipe.triplesFromSets(ms)
    timed("full_union") { ts.count() }
    timed("full_union_again") { ts.count() }
    // branch isolation (each family via pred filter — same plans, the
    // filter folds into the branch selects)
    timed("type_triples") { ts.filter(col("pred") === "rdf:type").count() }
    timed("mention_triples") { ts.filter(col("pred") === "MENTIONS").count() }
    timed("cooc_triples") { ts.filter(col("pred") === "COOCCURS_WITH").count() }
    // raw ingredients
    timed("doc_id_scan") { ms.select(col("doc_id")).count() }
    timed("pm_explode") {
      ms.select(explode(col("pm")).as("p")).count()
    }
    ms.unpersist(blocking = true)
    // variant: row-based localCheckpoint instead of the columnar cache —
    // no columnar encode on build, no pruning on read
    val ms2 = pipe.mentionSets(docs).localCheckpoint(false)
    timed("ckpt_build") { ms2.count() }
    val ts2 = pipe.triplesFromSets(ms2)
    timed("ckpt_full_union") { ts2.count() }
    timed("ckpt_full_union2") { ts2.count() }
    Runtime.getRuntime.halt(0)
  }
}
