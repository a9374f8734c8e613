package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.checkpoint.CheckpointStore

class CheckpointSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("commit + readOrCompute resumes without recompute") {
    val root = Files.createTempDirectory("graft-ckpt-").toString
    val store = new CheckpointStore(spark, root)
    var computes = 0
    def compute() = { computes += 1; spark.range(100).toDF("id") }
    val a = store.readOrCompute("s1")(compute())
    assert(a.count() == 100 && computes == 1)
    val b = store.readOrCompute("s1")(compute())
    assert(b.count() == 100 && computes == 1) // resumed, not recomputed
    assert(store.isCommitted("s1"))
  }

  test("range processing resumes only uncommitted ranges") {
    val root = Files.createTempDirectory("graft-ckpt-").toString
    val store = new CheckpointStore(spark, root)
    var calls = List.empty[(Long, Long)]
    def f(r: (Long, Long)) = { calls :+= r; spark.range(r._1, r._2).toDF("id") }
    val ranges = Seq((0L, 10L), (10L, 20L), (20L, 30L))
    val out = store.runRanges("docs", ranges)(f)
    assert(out.count() == 30 && calls.length == 3)
    // rerun: nothing recomputed
    val out2 = store.runRanges("docs", ranges)(f)
    assert(out2.count() == 30 && calls.length == 3)
    // extend the plan: only the new range runs
    val out3 = store.runRanges("docs", ranges :+ ((30L, 40L)))(f)
    assert(out3.count() == 40 && calls.length == 4)
    assert(store.committedRanges("docs") == Seq((0L, 10L), (10L, 20L), (20L, 30L), (30L, 40L)))
  }

  test("committedVersions lists live v<N> snapshots with holes after compaction") {
    val root = Files.createTempDirectory("graft-ckpt-").toString
    val store = new CheckpointStore(spark, root)
    assert(store.committedVersions("seen_node_ids") == Nil)
    store.commit("seen_node_ids/v1", spark.range(3).toDF("id"))
    store.commit("seen_node_ids/v3", spark.range(5).toDF("id"))
    assert(store.committedVersions("seen_node_ids") == Seq(1, 3))
    store.drop("seen_node_ids/v1") // compaction leaves a hole
    assert(store.committedVersions("seen_node_ids") == Seq(3))
    assert(store.committedVersions("seen_node_ids").maxOption.contains(3))
  }

  test("lineage manifests expose per-partition rows") {
    val root = Files.createTempDirectory("graft-ckpt-").toString
    val store = new CheckpointStore(spark, root)
    store.commit("stage_a", spark.range(50).repartition(4).toDF("id"))
    val lin = store.lineage()
    val row = lin.filter(col("stage") === "stage_a").head()
    assert(row.getAs[Long]("total_rows") == 50)
    assert(row.getAs[Long]("n_files") >= 1)
  }
}
