package graft

import org.apache.spark.sql.SparkSession

/** Round-5 probe (not part of the driver contract): runs the new queries at
  * sf0.01 and prints the data-dependent oracle VALUES (BPE merge table,
  * import-call script lines) for embedding into SparkEntry.oracleSql. */
object ScratchR5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val which: Set[String] = if (args.isEmpty) Set("all") else args.toSet
    def want(n: String) = which.contains("all") || which.contains(n)

    def esc(s: String) = s.replace("'", "''")

    if (want("bpe")) {
      val merges = graft.ops.TextOps.bpeLearnMerges(
        spark.read.parquet(s"$sfDir/documents.parquet"), nMerges = 12)
      val vocab = graft.ops.TextOps.bpeVocab(merges)
      println("== BPE merges (rank order) ==")
      merges.foreach { case (a, b) => println(s"MERGE\t$a\t$b") }
      println("== vocab VALUES ==")
      println(vocab.toSeq.sortBy(_._2)
        .map { case (s, i) => s"('${esc(s)}',$i)" }.mkString(", "))
      println("== replace chain (DuckDB) ==")
      val chain = merges.foldLeft("' '||array_to_string(string_split(w,''),' ')") {
        case (acc, (a, b)) => s"replace($acc, ' ${esc(a)} ${esc(b)}', ' ${esc(a)}${esc(b)}')"
      }
      println(chain)
    }

    for (q <- Seq("kg_sanitize", "kg_edge_dedup", "kg_rel_as_node",
        "dedup_recall", "text_bpe_encode", "kg_stream_nodes", "kg_import_call")
        if want(q)) {
      println(s"== $q ==")
      try {
        val df = SparkEntry.queries(q)(spark, sfDir)
        val rows = df.collect()
        println(s"rows=${rows.length}")
        if (q == "kg_import_call") {
          println("== import VALUES ==")
          rows.sortBy(r => (r.getString(0), r.getLong(1))).foreach { r =>
            println(s"  ('${esc(r.getString(0))}', ${r.getLong(1)}, '${esc(r.getString(2))}'),")
          }
        } else rows.take(30).foreach(println)
      } catch { case e: Throwable =>
        println(s"FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        e.getStackTrace.take(8).foreach(t => println(s"  at $t"))
      }
    }
    Runtime.getRuntime.halt(0)
  }
}
