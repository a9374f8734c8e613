package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.corpus.{AnalyticsDomain, Corpus}

/** Scaling probe (not part of the driver contract): per-stage wall times of
  * the BenchPipeline KG run at a given core count, fresh JVM per invocation.
  * args = (cores, nDocs). Prints one line per stage with the GC time that
  * accrued during it (all collectors summed). Mirrors the compact
  * (dictionary-coded) path that BenchPipeline.pipelineRun uses.
  */
object ScratchStages {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = BenchPipeline.newSession(cores)
    // same warmups as the reps=1 protocol
    BenchPipeline.pipelineRun(spark, 2000)
    BenchPipeline.pipelineRun(spark, math.max(20000L, nDocs / 20))

    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def timed[A](name: String)(f: => A): A = {
      val g0 = gcMillis; val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  gc=${(gcMillis - g0) / 1e3}%6.2f s")
      r
    }

    val parts = math.max(8, math.ceil(nDocs / 250000.0).toInt)
    // substage A: corpus synthesis alone (object map chain, no trie)
    timed("synthesize_only") {
      Corpus.synthesize(spark, nDocs, AnalyticsDomain.vocab, numPartitions = parts).count()
    }
    // substage B: synthesis + trie matching, no persist
    val pipe = KgPipeline.analytics(spark)
    timed("extract_nocache") {
      pipe.docMentionsCompact(
        Corpus.synthesize(spark, nDocs, AnalyticsDomain.vocab, numPartitions = parts)).count()
    }

    val docs = Corpus.synthesize(spark, nDocs, AnalyticsDomain.vocab, numPartitions = parts)
    val t0 = System.nanoTime()
    val dmc = pipe.docMentionsCompact(docs)
    dmc.persist(StorageLevel.MEMORY_AND_DISK)
    timed("extract+persist") { dmc.count() }
    val ns = pipe.nodesCompact(dmc)
    timed("nodes") { ns.count() }
    val me = pipe.mentionEdgesCompact(dmc)
    timed("mention_edges") { me.count() }
    val ce = pipe.cooccurrenceEdgesFromCompact(dmc)
    timed("cooc_edges") { ce.count() }
    val es = me.union(ce)
    val n = timed("triples_total") { pipe.triples(ns, es).count() }
    println(f"STAGE all_inclusive  ${(System.nanoTime() - t0) / 1e9}%7.2f s  triples=$n")
    Runtime.getRuntime.halt(0)
  }
}
