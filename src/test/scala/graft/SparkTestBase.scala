package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The standard test KgContext (schema + mini-biolink head ontology). */
  lazy val ctx: KgContext = KgContext.build(
    TestFixtures.resource("test_schema.yaml"),
    TestFixtures.resource("biolink_mini.ttl"),
    "entity",
  )
}
