package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: run SparkEntry.entry and print the row count
  * (driver checks rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"entry rows=${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
