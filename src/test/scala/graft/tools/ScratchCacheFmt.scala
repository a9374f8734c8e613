package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Cache-format probe (not a driver surface): isolates the InMemoryRelation
  * build + re-read cost for the fused working set's shape — one row per doc,
  * (string doc_id, ~14-element array<long>) — against a binary-packed
  * equivalent of the same bytes. Both variants are staged to parquet first
  * so the timed region is scan -> cache build -> count, generation excluded.
  * args = (cores, nRows).
  */
object ScratchCacheFmt {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nRows = args(1).toLong
    val spark = BenchPipeline.newSession(cores)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CF $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // ~14 longs per row, deterministic
    val base = spark.range(nRows).select(
      concat(lit("doc"), lpad(col("id").cast("string"), 10, "0")).as("doc_id"),
      transform(sequence(lit(0), pmod(col("id"), lit(9)).cast("int") + 9),
        x => shiftleft(pmod(col("id") + x, lit(4096)), 32) + (x + 1)).as("pm"))
    val dirA = s"/tmp/graft-cachefmt/arr-$nRows"
    val dirB = s"/tmp/graft-cachefmt/bin-$nRows"
    val fs = new org.apache.hadoop.fs.Path(dirA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dirA, "_SUCCESS"))) {
      base.repartition(cores * 4).write.mode("overwrite").parquet(dirA)
      base.select(col("doc_id"),
        aggregate(transform(col("pm"), x => unhex(lpad(hex(x), 16, "0"))),
          lit(Array.emptyByteArray), (acc, x) => concat(acc, x)).as("pmb"))
        .repartition(cores * 4).write.mode("overwrite").parquet(dirB)
    }

    for (pass <- 1 to 3) {
      val arr = spark.read.parquet(dirA).persist(StorageLevel.MEMORY_AND_DISK)
      timed(s"p$pass array  build") { arr.count() }
      timed(s"p$pass array  consume") {
        arr.select(explode(col("pm")).as("p")).agg(sum(shiftright(col("p"), 32))).collect()
      }
      arr.unpersist(true)

      val bin = spark.read.parquet(dirB).persist(StorageLevel.MEMORY_AND_DISK)
      timed(s"p$pass binary build") { bin.count() }
      bin.unpersist(true)

      // lower bound: cache WITHOUT doc_id (how much of the build is the
      // string column?)
      val arrNoId = spark.read.parquet(dirA).select(col("pm"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      timed(s"p$pass array-noid build") { arrNoId.count() }
      arrNoId.unpersist(true)

      // and scan-only (no cache at all): the floor both variants share
      timed(s"p$pass scan-only count") {
        spark.read.parquet(dirA).where(size(col("pm")) >= 0).count()
      }
    }
    Runtime.getRuntime.halt(0)
  }
}
