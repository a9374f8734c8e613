package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.AnalyticsDomain
import graft.model._

/** Ties the FROZEN `kg_import_call` oracle (a VALUES block captured from a
  * verified sf0.01 run, the documented kg_headers precedent) to the sink
  * codegen it pins (VERDICT r6 #8): the spec regenerates every script from
  * the four batch sinks over the same label layouts and part-file listing
  * the frozen block records, and asserts line-for-line equality. If the
  * sink grammar ever drifts intentionally, this fails first — regenerate
  * the oracle VALUES from the sinks, never the other way around. */
class ImportCallGoldenSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark

  /** (kind, seq, line) rows parsed out of the frozen oracle VALUES block
    * (SQL '' unescaped). */
  private lazy val frozen: Seq[(String, Int, String)] = {
    val sql = SparkEntry.oracleSql("kg_import_call")
    val rx = raw"\('(\w+)', (\d+), '((?:[^']|'')*)'\)".r
    rx.findAllMatchIn(sql)
      .map(m => (m.group(1), m.group(2).toInt, m.group(3).replace("''", "'")))
      .toSeq
  }

  private def frozenLines(kind: String): Seq[String] =
    frozen.filter(_._1 == kind).sortBy(_._2).map(_._3)

  test("frozen kg_import_call VALUES == sink-generated scripts") {
    import spark.implicits._
    assert(frozen.nonEmpty, "could not parse the frozen VALUES block")
    val parts = frozenLines("parts")
    assert(parts.nonEmpty)

    // stage the exact part listing the frozen block records
    val out = Files.createTempDirectory("graft-golden-").toString
    parts.foreach(p => Files.createFile(Path.of(out, p)))

    // same session config as the kg_import_call query
    val cfg = KgConfig(batchSize = 5000L, importCallFilePrefix = Some("/data/kg"))
    val ctx = AnalyticsDomain.context(cfg)

    // one representative entity per label: layouts (not row contents)
    // drive the scripts, and these are the layouts the corpus produces
    // (kg_headers pins the same shapes)
    val nodeClasses = Seq("execution engine", "relational operator",
      "storage structure", "workload")
    val ns = spark.createDataset(
      KgNode.make("d0", "document", "doc", Props.empty) +:
        nodeClasses.map(c =>
          KgNode.make(s"x:$c", c, "name", Props.of("name" -> PV.str("n")))))
    val es = spark.createDataset(Seq(
      KgEdge.make(null, "a", "b", "COOCCURS_WITH", Props.of("n_docs" -> PV.int(1))),
      KgEdge.make(null, "d0", "a", "MENTIONS", Props.of("n" -> PV.int(1)))))

    val pg = new graft.sinks.PostgresCsvSink(ctx, out)
    pg.probeNodeLayouts(ns)
    pg.probeEdgeLayouts(es)
    val neo = new graft.sinks.Neo4jCsvSink(ctx, out)
    val ar = new graft.sinks.ArangoCsvSink(ctx, out)
    val sq = new graft.sinks.SqliteCsvSink(ctx, out)
    Seq(neo, ar, sq).foreach { sk =>
      sk.nodeLayouts = pg.nodeLayouts; sk.edgeLayouts = pg.edgeLayouts
    }

    // the staged listing itself must match what partsOf reconstructs
    val gotParts = (pg.nodeLayouts.values ++ pg.edgeLayouts.values).toSeq
      .flatMap(lay => pg.partsOf(lay.fileLabel)).sorted
    assert(gotParts == parts, s"part listing drifted: $gotParts")

    def check(kind: String, script: String): Unit = {
      val got = script.linesIterator.toSeq
      val want = frozenLines(kind)
      assert(got == want,
        s"$kind script drifted from the frozen oracle:\n--- got ---\n" +
          got.mkString("\n") + "\n--- frozen ---\n" + want.mkString("\n"))
    }
    check("neo4j", neo.constructImportCall())
    check("postgres", pg.constructImportCall())
    check("sqlite", sq.constructImportCall())
    check("arango", ar.constructImportCall())
  }
}
