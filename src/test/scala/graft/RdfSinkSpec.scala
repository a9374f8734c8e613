package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.AnalyticsDomain
import graft.model._
import graft.sinks.{RdfSink, RdfVocab}

/** RDF writer parity (reference: test/output/write/graph/test_rdf.py,
  * writer semantics output/write/graph/_rdf.py:90-320,439-534): reified
  * edge statements, per-label files, CURIE namespace resolution, list
  * property explosion. */
class RdfSinkSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark

  private val bc = RdfVocab.Biocypher
  private def ctx = AnalyticsDomain.context()

  private def sink(tmp: java.nio.file.Path, format: String = "nt",
      ns: Map[String, String] = Map.empty) =
    new RdfSink(ctx, tmp.toString, format, ns)

  test("node statements: class decl, typed id, literal + list properties") {
    val s = sink(java.nio.file.Files.createTempDirectory("rdf-"))
    val n = KgNode("op:join", "relational operator", "op",
      Props.of("name" -> PV.str("join"), "tags" -> PV.arr(Seq("a", "b"))))
    val lines = s.nodeLines(n).toSet
    assert(s.classLine("relational operator") ==
      s"<${bc}RelationalOperator> <${RdfVocab.Rdf}type> <${RdfVocab.Rdfs}Class> .")
    assert(lines.contains(s"<${bc}op:join> <${RdfVocab.Rdf}type> <${bc}RelationalOperator> ."))
    assert(lines.contains(s"<${bc}op:join> <${bc}name> " + "\"join\" ."))
    // list property: one triple per item (reference add_property_to_graph)
    assert(lines.contains(s"<${bc}op:join> <${bc}tags> " + "\"a\" ."))
    assert(lines.contains(s"<${bc}op:join> <${bc}tags> " + "\"b\" ."))
  }

  test("N-Triples literals escape hostile strings at both layers") {
    val s = sink(java.nio.file.Files.createTempDirectory("rdf-"))
    // Layer 1: PV.str scrubs line breaks to spaces at entity creation
    // (reference _create.py:73-102) — the canonical ingestion path
    val n = KgNode("op:evil", "relational operator", "op",
      Props.of("name" -> PV.str("a\\b\"c\nd\re")))
    val lit = s.nodeLines(n).filter(_.contains(s"<${bc}name>"))
    assert(lit.size == 1)
    // backslash escaped FIRST (added escapes not re-escaped), then quote
    assert(lit.head.contains("\"a\\\\b\\\"c d e\""), lit.head)
    // Layer 2: a PV constructed directly (raw parquet decode bypasses
    // PV.str) still cannot break the line-oriented format — literal()
    // escapes \n/\r defensively
    val raw = KgNode("op:raw", "relational operator", "op",
      Props.of("name" -> PV("x\ny\rz", null, "str")))
    val rawLit = s.nodeLines(raw).filter(_.contains(s"<${bc}name>"))
    assert(rawLit.head.contains("\"x\\ny\\rz\""), rawLit.head)
    assert(!rawLit.head.contains('\n') && !rawLit.head.contains('\r'))
  }

  test("property names resolve through core vocabularies first") {
    assert(RdfVocab.propertyToUri("label") == RdfVocab.Rdfs + "label")
    assert(RdfVocab.propertyToUri("sameAs") == RdfVocab.Owl + "sameAs")
    assert(RdfVocab.propertyToUri("title") == RdfVocab.Dc + "title")
    assert(RdfVocab.propertyToUri("licence") == RdfVocab.Dcterms + "license")
    assert(RdfVocab.propertyToUri("n_docs") == bc + "n_docs")
  }

  test("CURIE ids resolve through configured namespaces") {
    val ns = Map("op" -> "https://ops.example.org/")
    val toUri = RdfVocab.subjectToUri(ns ++ Map("biocypher" -> bc)) _
    assert(toUri("op:join") == "https://ops.example.org/join")
    assert(toUri("unknown:x") == bc + "unknown:x") // unknown prefix -> biocypher
    assert(toUri("plainid") == bc + "plainid")
  }

  test("edge statements are REIFIED: predicate node + subject/object links") {
    val s = sink(java.nio.file.Files.createTempDirectory("rdf-"))
    val e = KgEdge("prel0", "doc1", "op:join", "mention",
      Props.of("n" -> PV.int(4)))
    val lines = s.edgeLines(e).toSet
    assert(lines.contains(s"<${bc}prel0> <${RdfVocab.Rdf}type> <${bc}Mention> ."))
    assert(lines.contains(s"<${bc}prel0> <${bc}subject> <${bc}doc1> ."))
    assert(lines.contains(s"<${bc}prel0> <${bc}object> <${bc}op:join> ."))
    assert(lines.contains(s"<${bc}prel0> <${bc}n> " + "\"4\" ."))
    // relId-less edges: predicate id = src+tgt (reference _rdf.py:132-133)
    val e2 = KgEdge(null, "a", "b", "mention", Props.empty)
    assert(s.edgeLines(e2).exists(_.startsWith(s"<${bc}ab> <${RdfVocab.Rdf}type>")))
  }

  test("writeNodes/writeEdges produce per-label part files; ttl gets prefixes") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("rdf-")
    val s = sink(tmp, format = "ttl", ns = Map("op" -> "https://ops.example.org/"))
    val nodes = Seq(
      KgNode("op:join", "relational operator", "op", Props.of("name" -> PV.str("join"))),
      KgNode("doc1", "document", "doc", Props.empty),
    ).toDS()
    val edges = Seq(
      KgEdge(null, "doc1", "op:join", "mention", Props.of("n" -> PV.int(2)))).toDS()
    s.writeNodes(nodes)
    s.writeEdges(edges)
    import scala.jdk.CollectionConverters._
    val names = java.nio.file.Files.list(tmp).iterator()
      .asScala.map(_.getFileName.toString).toSet
    assert(names.contains("RelationalOperator-part000.ttl"))
    assert(names.contains("Document-part000.ttl"))
    assert(names.contains("Mention-part000.ttl"))
    // per-label content spans part files (one per writing task, like the
    // reference's per-batch files) — assert over the concatenation
    def labelText(prefix: String): String =
      java.nio.file.Files.list(tmp).iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix + "-part"))
        .map(java.nio.file.Files.readString(_)).mkString("\n")
    val ttl = labelText("RelationalOperator")
    assert(ttl.startsWith("@prefix"))
    assert(ttl.contains("op:join rdf:type biocypher:RelationalOperator ."))
    assert(ttl.contains("biocypher:RelationalOperator rdf:type rdfs:Class ."))
    val ment = labelText("Mention")
    assert(ment.contains("biocypher:Mention rdf:type rdfs:Class ."))
    assert(ment.contains("biocypher:subject biocypher:doc1 ."))
  }

  test("rdf/xml format: reified edge golden + well-formed document") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("rdf-xml-")
    val s = sink(tmp, format = "xml", ns = Map("op" -> "https://ops.example.org/"))
    val edges = Seq(
      KgEdge("prel0", "doc1", "op:join", "mention", Props.of("n" -> PV.int(4)))).toDS()
    s.writeEdges(edges)
    import scala.jdk.CollectionConverters._
    val parts = java.nio.file.Files.list(tmp).iterator().asScala.toList
      .filter(_.getFileName.toString.matches("Mention-part\\d+\\.xml")).sorted
    assert(parts.nonEmpty)
    // every part is independently enveloped; content asserts span all parts
    val bodies = parts.map(java.nio.file.Files.readString(_))
    bodies.foreach(b => assert(b.startsWith("<?xml version=\"1.0\" encoding=\"utf-8\"?>")))
    val body = bodies.mkString("\n")
    assert(body.contains("<rdf:RDF "))
    assert(body.contains("xmlns:biocypher=\"https://biocypher.org/biocypher#\""))
    // the reified statements (reference _rdf.py:127-165 in rdflib xml form)
    assert(body.contains(
      s"""<rdf:Description rdf:about="${bc}prel0"><rdf:type rdf:resource="${bc}Mention"/></rdf:Description>"""))
    assert(body.contains(
      s"""<rdf:Description rdf:about="${bc}prel0"><biocypher:subject rdf:resource="${bc}doc1"/></rdf:Description>"""))
    assert(body.contains(
      s"""<rdf:Description rdf:about="${bc}prel0"><biocypher:object rdf:resource="https://ops.example.org/join"/></rdf:Description>"""))
    assert(body.contains(
      s"""<rdf:Description rdf:about="${bc}prel0"><biocypher:n>4</biocypher:n></rdf:Description>"""))
    // class declaration present and the document parses as XML
    assert(body.contains(
      s"""<rdf:Description rdf:about="${bc}Mention"><rdf:type rdf:resource="${RdfVocab.Rdfs}Class"/></rdf:Description>"""))
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    val nDesc = bodies.map { b =>
      val doc = dbf.newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(b.getBytes("UTF-8")))
      assert(doc.getDocumentElement.getLocalName == "RDF")
      doc.getDocumentElement.getElementsByTagNameNS(RdfVocab.Rdf, "Description").getLength
    }.sum
    assert(nDesc == 5) // class decl + type + subject + object + n literal
  }
}
