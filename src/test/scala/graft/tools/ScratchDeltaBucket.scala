package graft

import org.apache.spark.sql.functions._

/** Evidence probe (not a driver surface) for DeltaOps' co-location claim:
  * writing both snapshots BUCKETED by the compared columns makes the
  * delta's anti-joins shuffle-free — each bucket pair joins in place, so
  * at 100 TB the pass costs two bucket-local scans, no exchange of either
  * snapshot. Prints the executed plan's Exchange/SortMergeJoin counts for
  * the bucketed and unbucketed variants side by side.
  */
object ScratchDeltaBucket {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    import java.nio.file.Files
    // warehouse.dir is static conf — must be set before the session exists
    val wh = Files.createTempDirectory("graft_bucket_wh").toString
    System.setProperty("spark.sql.warehouse.dir", wh)
    val spark = BenchPipeline.newSession(8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the join shape

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"))
    val prev = docs.filter(col("doc_id") % 3 =!= 0)
    val next = docs.filter(col("doc_id") % 3 =!= 1)

    def audit(tag: String, p: org.apache.spark.sql.DataFrame,
        n: org.apache.spark.sql.DataFrame,
        assumeDistinct: Boolean = false, nullSafe: Boolean = true): Unit = {
      val out = graft.ops.DeltaOps.snapshotDelta(p, n, assumeDistinct, nullSafe)
      val qe = out.queryExecution
      val rows = qe.executedPlan.execute().count()
      val plan = qe.executedPlan.toString.split("== Initial Plan ==")(0)
      val ex = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("ReusedExchange"))
      val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      println(s"DELTA $tag rows=$rows exchanges=$ex sortMergeJoins=$smj")
      if (sys.env.contains("GRAFT_DELTA_PLAN")) println(plan)
    }

    audit("unbucketed", prev, next)

    val cols = Seq("doc_id", "source", "lang")
    prev.write.bucketBy(8, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*).saveAsTable("snap_prev")
    next.write.bucketBy(8, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*).saveAsTable("snap_next")
    audit("bucketed", spark.table("snap_prev"), spark.table("snap_next"))
    audit("bucketed+distinct", spark.table("snap_prev"),
      spark.table("snap_next"), assumeDistinct = true)
    // plain-equality keys: the distribution bucketing CAN satisfy
    audit("bucketed+distinct+plainEq", spark.table("snap_prev"),
      spark.table("snap_next"), assumeDistinct = true, nullSafe = false)
    Runtime.getRuntime.halt(0)
  }
}
