package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.model.{KgNode, PV, Props}
import graft.streaming.Streaming

/** Cross-micro-batch dedup semantics (the reference's session-lifetime
  * seen-set, test/output/in_memory/test_pandas.py:36-40) on Structured
  * Streaming state. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("stream dedup drops duplicates across micro-batches (first wins)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KgNode]
    val q = Streaming.dedupNodesStream(in.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(KgNode.make("a", "protein", "id", Props.of("v" -> PV.int(1))))
      q.processAllAvailable()
      // second batch: duplicate id 'a' (different props) + new id 'b'
      in.addData(
        KgNode.make("a", "protein", "id", Props.of("v" -> PV.int(2))),
        KgNode.make("b", "protein", "id", Props.of("v" -> PV.int(3))))
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[KgNode].collect()
      assert(out.map(_.id).sorted.toSeq == Seq("a", "b"))
      // first wins: 'a' kept the first batch's property value
      val a = out.find(_.id == "a").get
      assert(Props.get(a.props, "v").map(_.s).contains("1"))
    } finally q.stop()
  }

  test("windowed event agg with watermark runs as a stream") {
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // batch-mode semantics check of the same transformation
    val agg = Streaming.windowedEventAgg(batch)
    assert(agg.count() > 0)
    val row = agg.head()
    assert(row.getAs[Long]("n") > 0)
  }
}
