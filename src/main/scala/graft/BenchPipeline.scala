package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.{AnalyticsDomain, Corpus}

/** One KG-pipeline benchmark run in a fresh JVM: args = (cores, nDocs).
  * Prints a single JSON line {"cores":..,"docs":..,"sec":..,"triples":..}
  * and halts (bypassing SparkSession.stop(), which can hang on Netty
  * transport close in rapid session cycling — each parallelism level gets
  * its own process instead, which is also the honest analogue of separate
  * spark-submit cluster runs).
  */
object BenchPipeline {

  def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full KG-construction run over `nDocs` synthetic docs. */
  def pipelineRun(spark: SparkSession, nDocs: Long): (Double, Long) = {
    val docs = Corpus.synthesize(spark, nDocs, AnalyticsDomain.vocab)
    val pipe = KgPipeline.analytics(spark)
    val t0 = System.nanoTime()
    val dm = pipe.docMentions(docs)
    import org.apache.spark.storage.StorageLevel
    dm.persist(StorageLevel.fromString(
      sys.env.getOrElse("SPARK_GRAFT_CACHE_LEVEL", "MEMORY_AND_DISK")))
    val ns = pipe.nodes(dm)
    // cooc pairs derive from the persisted mention table — the corpus is
    // synthesized and trie-matched ONCE per run (was twice: 2nd full pass)
    val es = pipe.mentionEdges(dm).union(pipe.cooccurrenceEdgesFrom(dm))
    val n = pipe.triples(ns, es).count()
    dm.unpersist(blocking = false)
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    // best-of-N as the least-contended estimate: this host VM shows heavy
    // run-to-run CPU-steal noise (round-1 protocol, BASELINE.md); 7 reps
    // give the best-of a stable floor
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "7").toInt
    val spark = newSession(cores)
    pipelineRun(spark, 2000) // warm codegen/JIT
    // with reps=1 (the pair-sampling protocol, graft.Bench) the single
    // timed run must not pay residual JIT/compile cost: a second, larger
    // warm-up (~5% of the input) pushes the hot loops through C2 first
    if (reps == 1) pipelineRun(spark, math.max(20000L, nDocs / 20))
    // best-of-N: the host VM has high run-to-run noise (CPU steal); the
    // minimum is the least-contended estimate of the engine's cost
    val runs = (1 to reps).map(_ => pipelineRun(spark, nDocs))
    val (sec, triples) = runs.minBy(_._1)
    println(f"""{"cores":$cores,"docs":$nDocs,"sec":$sec%.2f,"triples":$triples,"reps":$reps}""")
    System.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
