package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.ops.DedupOps

/** Head-to-head shape comparison for the dedup_recall_sweep builder (r9):
  * A = shared sigs/sets + union-verify (serial chain), C = shared sigs/sets
  * + 3 independent verifies (parallel branches), R = r8 shape (independent
  * branches, no sharing) with the fixed 1-scan verifyCandidates. Each shape
  * runs the COMPLETE row (truth included) and is timed end-to-end, twice.
  * Not a driver surface.
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

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"T $name%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    def truthDf: DataFrame = DedupOps.jaccardPairs(docs, n = 2, minJ = 0.3)
      .select(col("doc_a"), col("doc_b")).localCheckpoint(false)

    def recallRow(r: Int, truth: DataFrame, got0: DataFrame): DataFrame = {
      val got = got0.withColumn("_hit", lit(1L))
      truth.join(got, Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_truth"),
          sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
        .select(lit(r).as("r"), col("n_truth"), col("n_hit"))
    }

    def shapeA(): Long = {
      val truth = truthDf
      val hashed = DedupOps.shingleHashes(docs, n = 2)
      val sigs = DedupOps.minhashSignaturesFrom(hashed, k = 16).localCheckpoint(false)
      val sets = DedupOps.shingleSetsFrom(hashed).localCheckpoint(false)
      val cands = Seq(2, 4, 8).map { r =>
        r -> DedupOps.lshCandidatesFrom(sigs, k = 16, r = r).localCheckpoint(false)
      }
      val allCand = cands.map(_._2.select(col("doc_a"), col("doc_b")))
        .reduce(_.union(_)).distinct()
      val verified = DedupOps.verifyCandidatesFrom(sets, allCand, minJ = 0.3)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(false)
      cands.map { case (r, cand) =>
        recallRow(r, truth, verified.join(cand.select(col("doc_a"), col("doc_b")),
          Seq("doc_a", "doc_b"), "left_semi"))
      }.reduce(_.union(_)).count()
    }

    def shapeC(): Long = {
      val truth = truthDf
      val hashed = DedupOps.shingleHashes(docs, n = 2)
      val sigs = DedupOps.minhashSignaturesFrom(hashed, k = 16).localCheckpoint(false)
      val sets = DedupOps.shingleSetsFrom(hashed).localCheckpoint(false)
      Seq(2, 4, 8).map { r =>
        val cand = DedupOps.lshCandidatesFrom(sigs, k = 16, r = r)
        recallRow(r, truth,
          DedupOps.verifyCandidatesFrom(sets, cand, minJ = 0.3)
            .select(col("doc_a"), col("doc_b")))
      }.reduce(_.union(_)).count()
    }

    def shapeR(): Long = {
      val truth = truthDf
      Seq(2, 4, 8).map { r =>
        val cand = DedupOps.lshCandidates(docs, n = 2, k = 16, r = r)
        recallRow(r, truth,
          DedupOps.verifyCandidates(docs, cand, n = 2, minJ = 0.3)
            .select(col("doc_a"), col("doc_b")))
      }.reduce(_.union(_)).count()
    }

    for (round <- 1 to 2) {
      timed(s"A#$round")(shapeA())
      timed(s"C#$round")(shapeC())
      timed(s"R#$round")(shapeR())
    }
    System.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
