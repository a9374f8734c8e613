package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => exprCol, expression => colExpr}
import org.apache.spark.storage.StorageLevel

/** Double-evaluation probe (not a driver surface): does the pushed-down
  * size(extract)>0 filter re-run the trie-walk expression under the
  * projection? Compares the persist-build time of
  *   A) current shape: select(extract as pm).where(size(pm)>0)
  *   B) unfiltered:    select(extract as pm)              (single eval)
  *   C) barrier:       select(doc_id, explode(array(extract)) as pm).where
  * args = (cores, nDocs).
  */
object ScratchDoubleEval {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = BenchPipeline.newSession(cores)
    import spark.implicits._
    BenchPipeline.pipelineRun(spark, 2000)
    BenchPipeline.pipelineRun(spark, math.max(20000L, nDocs / 20))
    val dir = BenchPipeline.ensureInput(spark, nDocs)
    def docs = spark.read.parquet(dir).as[graft.model.Doc]
    val pipe = KgPipeline.analytics(spark)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def extractCol = exprCol(graft.functions.ExtractMentionsKT(
      colExpr(col("spans.kind")), colExpr(col("spans.text")), pipe.bcDict))

    for (pass <- 1 to 3) {
      val a = pipe.mentionSets(docs).persist(StorageLevel.MEMORY_AND_DISK)
      val na = timed(s"p$pass A filtered ") { a.count() }
      a.unpersist(true)

      val b = docs.toDF().select(col("doc_id"), extractCol.as("pm"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nb = timed(s"p$pass B unfiltered") { b.count() }
      b.unpersist(true)

      val c = docs.toDF()
        .select(col("doc_id"), explode(array(extractCol)).as("pm"))
        .where(size(col("pm")) > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nc = timed(s"p$pass C barrier  ") { c.count() }
      c.unpersist(true)
      println(s"DE p$pass rows filtered=$na unfiltered=$nb barrier=$nc")
    }
    Runtime.getRuntime.halt(0)
  }
}
