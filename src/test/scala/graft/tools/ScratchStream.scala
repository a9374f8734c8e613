package graft

import org.apache.spark.sql.functions._

/** Cost breakdown probe for the kg_stream_nodes row (not a driver surface):
  * times staging, query start->drain, and variants (shuffle partitions,
  * state store provider) on the sf dir given in args(0).
  */
object ScratchStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = BenchPipeline.newSession(8)
    val pipe = KgPipeline.analytics(spark)
    // warm the session: batch twin first (plans, codegen, parquet footers)
    val warm = pipe.nodes(pipe.docMentions(
      graft.corpus.Corpus.fromDocumentsTable(spark.read.parquet(s"$dir/documents.parquet")))).count()
    println(s"warm batch nodes=$warm")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"T $name%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // stateless baseline: translate-only stream (no dedup state) — the
    // floor the stateful drain should be compared against
    locally {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "2")
      val streamIn = "/tmp/graft-stream-probe/stateless/in"
      val batchDocs = ss.read.parquet(s"$dir/documents.parquet")
      batchDocs.repartition(8).write.mode("overwrite").parquet(streamIn)
      for (tag <- Seq("cold", "warm")) timed(s"stateless $tag") {
        val docsStream = graft.corpus.Corpus.fromDocumentsTable(
          ss.readStream.schema(batchDocs.schema).option("maxFilesPerTrigger", 4)
            .parquet(streamIn))
        val nodes = graft.translate.Translate.nodes(
          graft.extract.Mentions.toRawNodesWithDocs(
            graft.extract.Mentions.detect(docsStream, pipe.bcDict)), pipe.bcCtx)
        val q = nodes.toDF().writeStream.format("memory")
          .queryName(s"probe_stateless_$tag").outputMode("append")
          .option("checkpointLocation", s"/tmp/graft-stream-probe/stateless/ckpt_$tag")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
    }

    for (variant <- Seq(("p8hdfs", "8", false), ("p4hdfs", "4", false),
                        ("p8rocks", "8", true), ("p2hdfs", "2", false),
                        ("p1hdfs", "1", false))) {
      val (vn, parts, rocks) = variant
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", parts)
      if (rocks) ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val streamIn = s"/tmp/graft-stream-probe/$vn/in"
      val ckpt = s"/tmp/graft-stream-probe/$vn/ckpt"
      val batchDocs = ss.read.parquet(s"$dir/documents.parquet")
      timed(s"$vn stage") {
        batchDocs.repartition(8).write.mode("overwrite").parquet(streamIn)
      }
      timed(s"$vn stream drain") {
        val docsStream = graft.corpus.Corpus.fromDocumentsTable(
          ss.readStream.schema(batchDocs.schema).option("maxFilesPerTrigger", 4)
            .parquet(streamIn))
        val nodes = graft.streaming.Streaming.ingestNodesStream(
          docsStream, pipe.bcDict, pipe.bcCtx, ttl = null)
        val q = nodes.toDF().writeStream.format("memory").queryName(s"probe_$vn")
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      val n = ss.table(s"probe_$vn").count()
      println(s"$vn rows=$n")
      // repeat drain on a FRESH checkpoint (warm plans): isolates first-use cost
      timed(s"$vn stream drain (warm)") {
        val docsStream = graft.corpus.Corpus.fromDocumentsTable(
          ss.readStream.schema(batchDocs.schema).option("maxFilesPerTrigger", 4)
            .parquet(streamIn))
        val nodes = graft.streaming.Streaming.ingestNodesStream(
          docsStream, pipe.bcDict, pipe.bcCtx, ttl = null)
        val q = nodes.toDF().writeStream.format("memory").queryName(s"probe2_$vn")
          .outputMode("append")
          .option("checkpointLocation", ckpt + "2")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
    }
    Runtime.getRuntime.halt(0)
  }
}
