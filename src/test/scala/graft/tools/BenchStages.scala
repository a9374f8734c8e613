package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.corpus.{AnalyticsDomain, Corpus}

/** Stage-level timing breakdown of the KG pipeline (diagnostic main).
  * args = (cores, nDocs). */
object BenchStages {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = BenchPipeline.newSession(cores)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.out.flush()
      r
    }
    val docs = Corpus.synthesize(spark, nDocs, AnalyticsDomain.vocab)
    val pipe = KgPipeline.analytics(spark)
    val ms = pipe.docMentions(docs).persist(StorageLevel.MEMORY_AND_DISK)
    t("doc_mentions")(println("  n=" + ms.count()))
    val ns = pipe.nodes(ms).persist(StorageLevel.MEMORY_AND_DISK)
    t("nodes")(println("  n=" + ns.count()))
    val me = pipe.mentionEdges(ms).persist(StorageLevel.MEMORY_AND_DISK)
    t("mention_edges")(println("  n=" + me.count()))
    val ce = pipe.cooccurrenceEdgesFrom(ms).persist(StorageLevel.MEMORY_AND_DISK)
    t("cooc_edges")(println("  n=" + ce.count()))
    val tr = pipe.triples(ns, me.union(ce))
    t("triples")(println("  n=" + tr.count()))
    // opt-in sink-write stage (kg_headers no longer measures the write
    // path; this keeps the rendered bulk-import write benchable)
    if (sys.env.get("SPARK_GRAFT_BENCH_SINK").contains("1")) {
      val outDir = java.nio.file.Files.createTempDirectory("graft-bench-sink-").toString
      t("neo4j_sink_write") {
        val sink = new graft.sinks.Neo4jCsvSink(pipe.bcCtx.value, outDir)
        sink.writeNodes(ns)
        sink.writeEdges(me.union(ce))
        sink.writeHeaders()
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
    }
    t("full_rerun")(println("  n=" + BenchPipeline.pipelineRun(spark, nDocs)))
    Runtime.getRuntime.halt(0)
  }
}
