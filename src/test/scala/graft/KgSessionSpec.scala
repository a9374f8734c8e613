package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.model.Props.Props

/** Mirrors the reference's core entry-point behaviors:
  * cross-call dedup (test/output/in_memory/test_pandas.py:36-40),
  * in-memory frames, import-call round trip. */
class KgSessionSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  def session(dbms: String = "neo4j") = new KgSession(
    spark, SparkTestBase.ctx, Files.createTempDirectory("graft-sess-").toString, dbms)

  def protein(id: String): RawNode =
    RawNode(id, "protein", Props.of(
      "name" -> PV.str("x"), "score" -> PV.dbl(1.0),
      "taxon" -> PV.int(9606), "genes" -> PV.arr(Seq("g"))))

  test("duplicates are dropped across successive add calls (first wins)") {
    val s = session()
    s.addNodes(spark.createDataset(Seq(protein("p1"), protein("p2"))))
    s.addNodes(spark.createDataset(Seq(protein("p2"), protein("p3"))))
    val frames = s.toDf()
    assert(frames("protein").count() == 3)
  }

  test("toDf pivots declared properties into typed columns") {
    val s = session()
    s.addNodes(spark.createDataset(Seq(protein("p1"))))
    val df = s.toDf()("protein")
    assert(df.columns.toSet ==
      Set("node_id", "node_label", "name", "score", "taxon", "genes", "id", "preferred_id"))
    val row = df.head()
    assert(row.getAs[String]("node_id") == "p1")
    assert(row.getAs[Long]("taxon") == 9606L)
    assert(row.getAs[Double]("score") == 1.0)
  }

  test("toDf edge frames carry pivoted property columns (reference _pandas.py:87-95)") {
    val s = session()
    s.addEdges(spark.createDataset(Seq(
      RawEdge("r1", "p1", "p2", "phosphorylation",
        Props.of("score" -> PV.dbl(0.7), "directed" -> PV.bool(true))),
      RawEdge("r2", "p2", "p3", "phosphorylation",
        Props.of("score" -> PV.dbl(0.9), "directed" -> PV.bool(false))))))
    val df = s.toDf()("phosphorylation")
    assert(df.columns.toSet == Set("relationship_id", "source_id", "target_id",
      "relationship_label", "score", "directed"),
      s"edge frame must carry its property columns, got ${df.columns.mkString(",")}")
    val r1 = df.filter(df("relationship_id") === "r1").head()
    assert(r1.getAs[String]("source_id") == "p1")
    assert(r1.getAs[String]("relationship_label") == "phosphorylation")
    assert(r1.getAs[Double]("score") == 0.7)
    assert(r1.getAs[Boolean]("directed"))
  }

  test("write path: nodes -> parts + headers + import call") {
    val s = session()
    s.writeNodes(spark.createDataset(Seq(protein("p1"), protein("p1"), protein("p2"))))
    val path = s.writeImportCall()
    val script = Files.readString(java.nio.file.Path.of(path))
    assert(script.contains("neo4j-admin"))
    val parts = Files.list(java.nio.file.Path.of(s.outDir)).iterator()
    var found = false
    while (parts.hasNext) { if (parts.next().getFileName.toString.startsWith("Protein-part")) found = true }
    assert(found)
  }

  test("rel-as-node edges write nodes before connector edges") {
    val s = session()
    val raw = spark.createDataset(Seq(
      RawEdge(null, "a", "b", "post_translational",
        Props.of("directed" -> PV.bool(true)))))
    s.writeEdges(raw)
    val files = Files.list(java.nio.file.Path.of(s.outDir)).iterator()
    val names = scala.collection.mutable.Set[String]()
    while (files.hasNext) names += files.next().getFileName.toString
    assert(names.exists(_.startsWith("PostTranslationalInteraction-part")))
    assert(names.exists(_.startsWith("IS_SOURCE_OF-part")))
    assert(names.exists(_.startsWith("IS_TARGET_OF-part")))
  }

  test("cross-call dedup also applies to the write path") {
    val s = session()
    s.writeNodes(spark.createDataset(Seq(protein("p1"))))
    s.writeNodes(spark.createDataset(Seq(protein("p1"), protein("p2"))))
    // p1 written once: part000 has 1 row, part001 has only p2
    val all = Files.list(java.nio.file.Path.of(s.outDir)).iterator()
    var rows = List.empty[String]
    while (all.hasNext) {
      val p = all.next()
      if (p.getFileName.toString.startsWith("Protein-part"))
        rows ++= Files.readAllLines(p).toArray(Array.empty[String]).toList
    }
    assert(rows.count(_.startsWith("p1;")) == 1)
    assert(rows.count(_.startsWith("p2;")) == 1)
  }

  test("seen state is checkpointed: a NEW session over the same outDir resumes dedup") {
    val dir = Files.createTempDirectory("graft-resume-").toString
    val a = new KgSession(spark, SparkTestBase.ctx, dir)
    a.writeNodes(spark.createDataset(Seq(protein("p1"), protein("p2"))))
    // fresh session, same outDir: p1/p2 already seen (checkpointed snapshot)
    val b = new KgSession(spark, SparkTestBase.ctx, dir)
    b.writeNodes(spark.createDataset(Seq(protein("p1"), protein("p2"), protein("p3"))))
    val all = Files.list(java.nio.file.Path.of(dir)).iterator()
    var rows = List.empty[String]
    while (all.hasNext) {
      val p = all.next()
      if (p.getFileName.toString.startsWith("Protein-part"))
        rows ++= Files.readAllLines(p).toArray(Array.empty[String]).toList
    }
    assert(rows.count(_.startsWith("p1;")) == 1)
    assert(rows.count(_.startsWith("p2;")) == 1)
    assert(rows.count(_.startsWith("p3;")) == 1)
  }

  test("rel-as-node entities are session-deduped across writeEdges calls") {
    val s = session()
    val raw = spark.createDataset(Seq(
      RawEdge(null, "a", "b", "post_translational",
        Props.of("directed" -> PV.bool(true)))))
    s.writeEdges(raw)
    s.writeEdges(raw) // same reified relationship again: must NOT rewrite
    val files = Files.list(java.nio.file.Path.of(s.outDir)).iterator()
    var relRows = List.empty[String]
    while (files.hasNext) {
      val p = files.next()
      if (p.getFileName.toString.startsWith("PostTranslationalInteraction-part"))
        relRows ++= Files.readAllLines(p).toArray(Array.empty[String]).toList
    }
    assert(relRows.length == 1)
  }

  test("sink factory covers rdf, plain csv and networkx writers") {
    val rdf = session("rdf")
    rdf.writeNodes(spark.createDataset(Seq(protein("p:1"))))
    val rdfNames = {
      val it = Files.list(java.nio.file.Path.of(rdf.outDir)).iterator()
      val b = scala.collection.mutable.Set[String]()
      while (it.hasNext) b += it.next().getFileName.toString
      b
    }
    assert(rdfNames.exists(_.startsWith("Protein-part")))
    val csv = session("csv")
    csv.writeNodes(spark.createDataset(Seq(protein("p1"))))
    assert(Files.exists(java.nio.file.Path.of(csv.outDir, "protein.csv")))
    val script = Files.readString(java.nio.file.Path.of(csv.writeImportCall()))
    assert(script.contains("pd.read_csv('./protein.csv'"))
    val nx = session("networkx")
    nx.writeNodes(spark.createDataset(Seq(protein("p1"))))
    nx.writeEdges(spark.createDataset(Seq(
      RawEdge("r1", "p1", "p1", "phosphorylation", Props.empty))))
    assert(Files.isDirectory(java.nio.file.Path.of(nx.outDir, "networkx_graph")))
    assert(Files.readString(java.nio.file.Path.of(nx.writeImportCall()))
      .contains("nx.from_pandas_edgelist"))
  }

  test("plain csv sink appends across calls: one header, continued index") {
    val s = session("csv")
    s.writeNodes(spark.createDataset(Seq(protein("p1"), protein("p2"))))
    s.writeNodes(spark.createDataset(Seq(protein("p3")))) // disjoint after dedup
    val lines = Files.readAllLines(
      java.nio.file.Path.of(s.outDir, "protein.csv")).toArray(Array.empty[String])
    assert(lines.count(_.contains("node_id")) == 1, "exactly one header")
    assert(lines.length == 4) // header + 3 rows
    // pandas index continues across the append
    assert(lines.drop(1).map(_.takeWhile(_ != ',')).sorted.toSeq == Seq("0", "1", "2"))
    assert(lines.exists(_.contains("p3")))
  }

  test("networkx sink accumulates edges across writeEdges and writeRelAsNodes") {
    val s = session("networkx")
    s.writeEdges(spark.createDataset(Seq(
      RawEdge("r1", "p1", "p2", "phosphorylation", Props.empty))))
    // rel-as-node edges land in a writeRelAsNodes call AFTER plain edges:
    // pre-fix this overwrote the earlier edges.parquet
    s.writeEdges(spark.createDataset(Seq(
      RawEdge(null, "p1", "p2", "post_translational",
        Props.of("directed" -> PV.bool(true))))))
    val edges = spark.read.parquet(s"${s.outDir}/networkx_graph/edges.parquet")
    val labels = edges.select("relationship_label").as[String].collect().toSet
    assert(labels.contains("phosphorylation"))
    assert(labels.contains("IS_SOURCE_OF") && labels.contains("IS_TARGET_OF"),
      s"rel-as-node connector edges must coexist with plain edges, got $labels")
  }

  test("schema info yaml marks present classes") {
    val s = session()
    val ns = spark.createDataset(Seq(
      KgNode.make("p1", "protein", "uniprot", Props.empty)))
    val es = spark.emptyDataset[KgEdge]
    val yaml = s.schemaInfoYaml(ns, es)
    assert(yaml.contains("protein:\n  represented_as: node\n  present_in_knowledge_graph: True"))
    assert(yaml.contains("microRNA:\n  represented_as: node\n  present_in_knowledge_graph: False"))
  }

  test("writeNodesForce writes out-of-schema labels through the sink (reference force=True, _batch_writer.py:479)") {
    val s = session()
    s.writeNodesForce(spark.createDataset(Seq(
      KgNode.make("x1", "custom_thing", null, Props.of("note" -> PV.str("n"))))))
    val out = new java.io.File(s.outDir)
    def allFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(allFiles) else Seq(f)
    assert(allFiles(out).exists(_.getName.startsWith("Custom_thing-part")),
      s"expected Custom_thing part files, saw ${allFiles(out).map(_.getName).mkString(",")}")
  }

  test("getKg returns the dbms-shaped in-memory KG (reference _core.py:517-539)") {
    val s = session() // neo4j -> per-label frames
    s.addNodes(spark.createDataset(Seq(protein("p1"))))
    assert(s.getKg().left.toOption.exists(_.contains("protein")))
    val nx = session("networkx")
    nx.addNodes(spark.createDataset(Seq(protein("p1"))))
    nx.getKg() match {
      case Right((n, e)) =>
        assert(n.columns.toSeq == Seq("node_id", "node_label", "attrs"))
        assert(n.count() == 1 && e.count() == 0)
      case Left(_) => fail("networkx session must return the frame pair")
    }
  }

  test("toNetworkx frames match the NetworkxSink loader shape (reference _core.py:218-220)") {
    val s = session()
    s.addNodes(spark.createDataset(Seq(protein("p1"))))
    s.addEdges(spark.createDataset(Seq(
      RawEdge("r1", "p1", "p2", "phosphorylation", Props.of("score" -> PV.dbl(0.7))))))
    val (nx, ex) = s.toNetworkx()
    assert(nx.columns.toSeq == Seq("node_id", "node_label", "attrs"))
    assert(ex.columns.toSeq == Seq("source_id", "target_id", "relationship_label"))
    val n = nx.filter(nx("node_id") === "p1").head()
    // in-memory labels stay sentence-case class names, same as toDf keys
    assert(n.getAs[String]("node_label") == "protein")
    assert(n.getAs[String]("attrs").contains("\"taxon\":9606"))
    assert(ex.count() == 1)
    // empty session: schema-stable empty frames, no exceptions
    val (en, ee) = session().toNetworkx()
    assert(en.count() == 0 && ee.count() == 0)
  }

  test("logMissingInputLabels reports unmapped input labels with counts (reference _core.py:559-588)") {
    val s = session()
    val miss = s.logMissingInputLabels(
      spark.createDataset(Seq(protein("p1"),
        RawNode("m1", "mystery_kind", Props.empty),
        RawNode("m2", "mystery_kind", Props.empty))),
      spark.createDataset(Seq(
        RawEdge("r1", "a", "b", "unknown_rel", Props.empty))))
    assert(miss == Map("mystery_kind" -> 2L, "unknown_rel" -> 1L))
    // all-mapped input: empty map, mirroring the reference's None branch
    assert(s.logMissingInputLabels(
      spark.createDataset(Seq(protein("p9"))),
      spark.emptyDataset[RawEdge]).isEmpty)
  }

  test("logDanglingEdges reports missing endpoints with counts, bounded collect") {
    val s = session()
    val nodes = spark.createDataset(Seq(
      KgNode.make("a", "Protein", "id", Props.empty),
      KgNode.make("x", "Protein", "id", Props.empty)))
    val edges = spark.createDataset(Seq(
      KgEdge.make(null, "a", "x", "INTERACTS", Props.empty),
      KgEdge.make(null, "a", "ghost", "INTERACTS", Props.empty),
      KgEdge.make(null, "phantom", "x", "INTERACTS", Props.empty)))
    val report = s.logDanglingEdges(nodes, edges)
    assert(report.startsWith("Dangling edge endpoints: 2\n"))
    assert(report.contains("src INTERACTS phantom x1"))
    assert(report.contains("tgt INTERACTS ghost x1"))
    // fully-resolved graph: zero findings
    assert(s.logDanglingEdges(nodes,
        spark.createDataset(Seq(KgEdge.make(null, "a", "x", "INTERACTS", Props.empty))))
      .startsWith("Dangling edge endpoints: 0"))
  }

  test("term translation + summary report (reference _core.py:757-781)") {
    val s = session()
    assert(s.translateTerm("protein").contains("Protein"))
    assert(s.translateTerm("gene_disease").contains("PERTURBED_IN_DISEASE"))
    assert(s.translateTerm("no_such_label").isEmpty)
    assert(s.reverseTranslateTerm("Protein").contains(List("protein")))
    assert(s.reverseTranslateTerm("NoSuchLabel").isEmpty)
    val ns = spark.createDataset(Seq(
      KgNode.make("p1", "protein", "uniprot", Props.empty),
      KgNode.make("p1", "protein", "uniprot", Props.empty)))
    val es = spark.emptyDataset[KgEdge]
    val rep = s.summary(ns, es)
    assert(rep.contains("Duplicate node ids: 1"))
    assert(rep.contains("protein p1 x2"))
    assert(rep.contains("Duplicate edge keys: 0"))
    // reference summary() chains ontology + duplicates + MISSING-LABELS
    // (not schema presence — ADVICE r6); the missing leg renders when the
    // raw adapter streams are passed
    assert(!rep.contains("present_in_knowledge_graph"))
    val withMissing = s.summary(ns, es,
      rawNodes = Some(spark.createDataset(Seq(
        RawNode("m1", "mystery_kind", Props.empty)))))
    assert(withMissing.contains("Missing input labels: 1"))
    assert(withMissing.contains("mystery_kind x1"))
    // with the driver-side ontology passed, the tree renders first
    // (reference summary() chains show_ontology_structure, _core.py:774-781)
    val onto = graft.ontology.Ontology.fromTtl(
      TestFixtures.resource("biolink_mini.ttl"), "entity",
      graft.schema.SchemaExpander.extend(
        graft.schema.SchemaExpander.parseYaml(TestFixtures.resource("test_schema.yaml"))))
    val withTree = s.summary(ns, es, Some(onto))
    assert(withTree.indexOf("entity") >= 0 &&
      withTree.indexOf("entity") < withTree.indexOf("Duplicate node ids"))
  }

  test("writeSchemaInfo asNode force-writes the schema_info node (reference _core.py:741-752)") {
    val s = session()
    val ns = spark.createDataset(Seq(
      KgNode.make("p1", "protein", "uniprot", Props.empty)))
    val es = spark.emptyDataset[KgEdge]
    val yaml = s.writeSchemaInfo(ns, es, asNode = true)
    assert(yaml.contains("present_in_knowledge_graph: True"))
    val out = new java.io.File(s.outDir)
    def allFiles(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(allFiles) else Seq(f)
    // the YAML sidecar always lands (reference _core.py:737)
    assert(allFiles(out).exists(_.getName == "schema_info.yaml"))
    // the forced node bypasses schema translation and lands as its own
    // label's part files, pascal-cased like every label file (sentence-case
    // pascal splits on spaces, so "schema_info" -> "Schema_info", matching
    // the reference's name_sentence_to_pascal)
    val schemaParts = allFiles(out).filter(_.getName.startsWith("Schema_info-part"))
    assert(schemaParts.nonEmpty, s"expected Schema_info part files under ${s.outDir}")
    val content = schemaParts.filter(_.getName.endsWith(".csv"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
    assert(content.contains("schema_info"))
    // the NODE carries the schema as JSON (reference json.dumps,
    // _core.py:747); the YAML stays in the sidecar only (ADVICE r6)
    assert(content.contains("\"\"represented_as\"\": \"\"node\"\"") ||
      content.contains("\"represented_as\": \"node\""),
      s"schema_info node property must be JSON, got: ${content.take(300)}")
    assert(!content.contains("represented_as: node"))
    // repeated calls go through the session Deduplicator (reference
    // force=True skips translation, NOT node_seen, _batch_writer.py:423):
    // no duplicate part files on a second call
    s.writeSchemaInfo(ns, es, asNode = true)
    val partsAfter = allFiles(out).filter(_.getName.startsWith("Schema_info-part"))
      .filter(_.getName.endsWith(".csv"))
    val rowsAfter = partsAfter
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .mkString.linesIterator.count(_.nonEmpty)
    assert(rowsAfter == 1,
      s"second writeSchemaInfo(asNode) must dedup against node_seen, got $rowsAfter rows")
  }

  test("seen-set TTL + compaction: within-horizon keys dedup, expired keys re-emit, one snapshot") {
    // injectable clock, 1000 ms horizon (VERDICT r4 #9 — the batch-session
    // twin of the streaming state TTL)
    var clock = 0L
    val outDir = Files.createTempDirectory("graft-ttl-").toString
    val s = new KgSession(spark, SparkTestBase.ctx, outDir,
      seenTtlMs = Some(1000L), nowMs = () => clock)
    s.addNodes(spark.createDataset(Seq(protein("a"), protein("b"))))
    clock = 500L
    // 'a' resights (deduped, stamp refreshed to 500); 'c' is fresh
    s.addNodes(spark.createDataset(Seq(protein("a"), protein("c"))))
    clock = 1200L
    // horizon 1000: cutoff 200 — 'a' (last seen 500) still dedups,
    // 'b' (last seen 0) expired and re-emits
    s.addNodes(spark.createDataset(Seq(protein("a"), protein("b"))))
    val ids = s.toDf()("protein").select("node_id").as[String].collect().sorted.toSeq
    assert(ids == Seq("a", "b", "b", "c"),
      s"'b' must re-emit after expiry, 'a' must stay deduped; got $ids")
    // compaction: exactly ONE live snapshot version remains on disk
    val base = java.nio.file.Paths.get(s"$outDir/_graft_checkpoint/stage=seen_node_ids")
    import scala.jdk.CollectionConverters._
    val versions = Files.list(base).iterator().asScala.map(_.getFileName.toString).toList
    assert(versions == List("v3"), s"superseded snapshots must be compacted away, got $versions")
    // and a NEW session over the same outDir resumes from the compacted max
    clock = 1300L
    val s2 = new KgSession(spark, SparkTestBase.ctx, outDir,
      seenTtlMs = Some(1000L), nowMs = () => clock)
    s2.addNodes(spark.createDataset(Seq(protein("a"), protein("d"))))
    val ids2 = s2.toDf()("protein").select("node_id").as[String].collect().sorted.toSeq
    assert(ids2 == Seq("d"), s"resumed compacted snapshot must still dedup 'a'; got $ids2")
  }
}
