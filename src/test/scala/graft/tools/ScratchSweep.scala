package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Cost decomposition probe for the dedup_recall_sweep row (r9): times each
  * component of the sweep builder in isolation on sf0.1 so the builder's
  * shape is chosen from measurements, not guesses. Not a driver surface.
  */
object ScratchSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"T $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (round <- Seq("cold", "warm")) {
      println(s"== $round ==")
      val truth = timed("truth jaccardPairs(0.3)") {
        val t = DedupOps.jaccardPairs(docs, n = 2, minJ = 0.3)
          .select(col("doc_a"), col("doc_b")).localCheckpoint(false)
        t.count(); t
      }
      val sigs = timed("sigs materialize") {
        val s = DedupOps.minhashSignaturesFrom(
          DedupOps.shingleHashes(docs, n = 2), k = 16).localCheckpoint(false)
        s.count(); s
      }
      val sets = timed("sets materialize") {
        val s = DedupOps.shingleSetsFrom(DedupOps.shingleHashes(docs, n = 2))
          .localCheckpoint(false)
        s.count(); s
      }
      val cands = timed("cands r=2,4,8 materialize") {
        val c = Seq(2, 4, 8).map { r =>
          r -> DedupOps.lshCandidatesFrom(sigs, k = 16, r = r).localCheckpoint(false)
        }
        c.foreach(_._2.count()); c
      }
      val allCand = cands.map(_._2.select(col("doc_a"), col("doc_b")))
        .reduce(_.union(_)).distinct()
      val verified = timed("verify(allCand)") {
        val v = DedupOps.verifyCandidatesFrom(sets, allCand, minJ = 0.3)
          .select(col("doc_a"), col("doc_b")).localCheckpoint(false)
        v.count(); v
      }
      timed("3 recall aggs") {
        cands.map { case (r, cand) =>
          val got = verified.join(cand.select(col("doc_a"), col("doc_b")),
              Seq("doc_a", "doc_b"), "left_semi")
            .withColumn("_hit", lit(1L))
          truth.join(got, Seq("doc_a", "doc_b"), "left")
            .agg(count(lit(1)).as("n_truth"),
              sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
            .select(lit(r).as("r"), col("n_truth"), col("n_hit"))
        }.reduce(_.union(_)).count()
      }
    }
    System.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
