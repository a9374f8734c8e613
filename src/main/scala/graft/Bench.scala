package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.{AnalyticsDomain, Corpus}

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  plus KG-pipeline throughput at two parallelism levels (local[8] vs
  *  local[32]) on an identical deterministic synthetic corpus, and the
  *  scaling efficiency  throughput_4N / (4 x throughput_N)  — the sandbox
  *  evidence protocol for BASELINE.json's two-cluster-size criterion
  *  (see BASELINE.md).}
  */
object Bench {

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full KG-construction run over `nDocs` synthetic docs; returns
    * (elapsedSec, nTriples). */
  private def pipelineRun(spark: SparkSession, nDocs: Long): (Double, Long) = {
    val docs = Corpus.synthesize(spark, nDocs, AnalyticsDomain.vocab)
    val pipe = KgPipeline.analytics(spark)
    val t0 = System.nanoTime()
    val ms = pipe.mentions(docs)
    import org.apache.spark.storage.StorageLevel
    ms.persist(StorageLevel.MEMORY_AND_DISK)
    val ns = pipe.nodes(ms)
    val es = pipe.mentionEdges(ms).union(pipe.cooccurrenceEdges(ms))
    val n = pipe.triples(ns, es).count()
    ms.unpersist(blocking = false)
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "60000").toLong

    // 1) headline per-query timings at the requested parallelism
    val spark = newSession(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // warm JIT/codegen for the pipeline before the measured scaling runs
    pipelineRun(spark, 2000)
    spark.stop()

    // 2) identical pipeline at N and 4N cores on the same deterministic corpus
    val sparkN = newSession(8)
    pipelineRun(sparkN, 2000) // warm this session too
    val (secN, triplesN) = pipelineRun(sparkN, benchDocs)
    sparkN.stop()
    val spark4N = newSession(32)
    pipelineRun(spark4N, 2000)
    val (sec4N, triples4N) = pipelineRun(spark4N, benchDocs)
    spark4N.stop()

    val thrN = triplesN / secN
    val thr4N = triples4N / sec4N
    val eff = thr4N / (4.0 * thrN)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""kg_bench_docs":$benchDocs,"kg_triples":$triples4N,""" +
        f""""kg_sec_n8":$secN%.2f,"kg_sec_n32":$sec4N%.2f,""" +
        f""""kg_triples_per_sec_n8":$thrN%.0f,"kg_triples_per_sec_n32":$thr4N%.0f,""" +
        f""""kg_scaling_efficiency":$eff%.3f}""")
  }
}
