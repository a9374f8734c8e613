package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.model.Props.Props
import graft.translate.Translate
import graft.dedup.Dedup

/** Mirrors reference test/test_translate.py + test_deduplicate.py with the
  * same input tuples and expected labels/ids. */
class TranslateSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark
  lazy val ctx = SparkTestBase.ctx
  lazy val bc = spark.sparkContext.broadcast(ctx)
  import spark.implicits._

  def nodeTuples: Seq[RawNode] = Seq(
    RawNode("G9205", "protein", Props.of("taxon" -> PV.int(9606))),
    RawNode("hsa-miR-132-3p", "mirna", Props.of("taxon" -> PV.int(9606))),
    RawNode("ASDB_OSBS", "complex", Props.of("taxon" -> PV.int(9606))),
    RawNode("REACT:25520", "reactome", Props.empty),
    RawNode("TODO:nonexistent", "not_in_schema", Props.empty),
  )

  test("translate nodes: label mapping incl. virtual leaves (test_translate.py:33-62)") {
    val out = Translate.nodes(spark.createDataset(nodeTuples), bc).collect()
    assert(out.length == 4) // unknown label dropped
    val byId = out.map(n => n.id -> n).toMap
    assert(byId("G9205").label == "protein")
    assert(byId("G9205").preferredId == "uniprot")
    assert(byId("hsa-miR-132-3p").label == "microRNA")
    assert(byId("ASDB_OSBS").label == "complex")
    assert(byId("REACT:25520").label == "reactome.pathway")
    assert(byId("REACT:25520").preferredId == "reactome")
  }

  test("id and preferred_id are injected into properties") {
    val out = Translate.nodes(spark.createDataset(nodeTuples.take(1)), bc).collect().head
    assert(Props.get(out.props, "id").map(_.s).contains("G9205"))
    assert(Props.get(out.props, "preferred_id").map(_.s).contains("uniprot"))
  }

  test("property whitelist fills missing with none; blacklist excludes") {
    val n = RawNode("p1", "protein", Props.of(
      "name" -> PV.str("StringProperty1"),
      "score" -> PV.dbl(4.0),
      "taxon" -> PV.int(9606),
      "genes" -> PV.arr(Seq("gene1", "gene2")),
      "not_declared" -> PV.str("drop me"),
    ))
    val out = Translate.nodes(spark.createDataset(Seq(n)), bc).collect().head
    assert(!Props.contains(out.props, "not_declared"))
    assert(Props.get(out.props, "genes").get.arr == Seq("gene1", "gene2"))
    // gene class blacklists accession
    val g = RawNode("HGNC:1", "hgnc", Props.of(
      "accession" -> PV.str("x"), "keep" -> PV.str("y")))
    val gout = Translate.nodes(spark.createDataset(Seq(g)), bc).collect().head
    assert(gout.label == "gene")
    assert(!Props.contains(gout.props, "accession"))
    assert(Props.contains(gout.props, "keep"))
  }

  test("constNodes == typed nodes for every label, byte-identical rows") {
    import org.apache.spark.sql.functions.col
    // labels with whitelists (None-fill), preferred ids, virtual leaves —
    // plus ids needing Py.sanitize (embedded newlines/CRs)
    val ids = Seq("G9205", "A\nB", "C\r\nD", "E\rF", "plain")
    for (label <- Seq("protein", "reactome", "mirna", "not_in_schema")) {
      val typed = Translate.nodes(
        spark.createDataset(ids.map(id => RawNode(id, label, Props.empty))), bc)
        .collect().sortBy(_.id).toSeq
      val const = Translate.constNodes(
        ids.toDF("the_id"), "the_id", label, bc)
        .collect().sortBy(_.id).toSeq
      assert(const == typed, s"label=$label")
    }
    // strict-mode fallback still routes through the typed checks
    val strictCtx = KgContext.build(
      TestFixtures.resource("test_schema.yaml"),
      TestFixtures.resource("biolink_mini.ttl"),
      "entity", config = KgConfig(strictMode = true))
    val bcStrict = spark.sparkContext.broadcast(strictCtx)
    val e = intercept[Exception] {
      Translate.constNodes(Seq("x").toDF("the_id"), "the_id", "protein", bcStrict)
        .collect()
    }
    def hasStrict(t: Throwable): Boolean =
      t != null && (String.valueOf(t.getMessage).contains("Strict mode") || hasStrict(t.getCause))
    assert(hasStrict(e))
    val _ = col("") // keep the import used on all branches
  }

  def edgeTuples: Seq[RawEdge] = Seq(
    RawEdge(null, "G15258", "MONDO1", "gene_disease", Props.empty),
    RawEdge(null, "G15258", "MONDO2", "protein_disease", Props.empty),
    RawEdge(null, "G15258", "G15242", "phosphorylation", Props.empty),
    RawEdge(null, "G15258", "G16347", "post_translational",
      Props.of("directed" -> PV.bool(true), "effect" -> PV.int(-1))),
    RawEdge(null, "G15258", "G16347", "not_a_label", Props.empty),
  )

  test("translate edges: label_as_edge + plain edges (test_translate.py:65-127)") {
    val out = Translate.edges(spark.createDataset(edgeTuples), bc).collect()
    assert(out.length == 4)
    val edges = out.filter(_.edge != null).map(_.edge)
    assert(edges.count(_.label == "PERTURBED_IN_DISEASE") == 2)
    assert(edges.count(_.label == "phosphorylation") == 1)
  }

  test("rel-as-node reification with synthetic id (test_translate.py:125)") {
    val out = Translate.edges(spark.createDataset(edgeTuples), bc).collect()
    val rels = out.filter(_.rel != null).map(_.rel)
    assert(rels.length == 1)
    val r = rels.head
    assert(r.node.id == "G15258_G16347_True_-1")
    assert(r.node.label == "post translational interaction")
    assert(r.sourceEdge.label == "IS_SOURCE_OF")
    assert(r.targetEdge.label == "IS_TARGET_OF")
    assert(r.sourceEdge.src == "G15258")
    assert(r.sourceEdge.tgt == r.node.id)
    assert(r.targetEdge.src == "G16347")
  }

  test("rel-as-node undirected uses IS_PART_OF; explicit id wins") {
    val e = RawEdge("myid", "a", "b", "post_translational", Props.empty)
    val r = Translate.edges(spark.createDataset(Seq(e)), bc).collect().head.rel
    assert(r.node.id == "myid")
    assert(r.sourceEdge.label == "IS_PART_OF" && r.targetEdge.label == "IS_PART_OF")
  }

  test("missing input labels are counted (test_translate.py notype)") {
    val m = Translate.missingNodeTypes(spark, spark.createDataset(nodeTuples), bc)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("not_in_schema" -> 1L))
  }

  test("node dedup is global across labels (test_deduplicate.py)") {
    val ns = Seq(
      KgNode.make("x", "protein", "uniprot", Props.empty),
      KgNode.make("x", "microRNA", "mirbase", Props.empty),
      KgNode.make("y", "protein", "uniprot", Props.empty),
    )
    assert(Dedup.nodes(spark.createDataset(ns)).count() == 2)
    assert(Dedup.nodesSalted(spark.createDataset(ns)).count() == 2)
    val dups = Dedup.duplicateNodeReport(spark.createDataset(ns)).collect()
    assert(dups.map(_.getString(1)).toSeq == Seq("x"))
  }

  test("edge dedup is per label on relId or src_tgt") {
    val es = Seq(
      KgEdge.make(null, "a", "b", "PERTURBED_IN_DISEASE", Props.empty),
      KgEdge.make(null, "a", "b", "PERTURBED_IN_DISEASE", Props.empty),
      KgEdge.make(null, "a", "b", "phosphorylation", Props.empty), // same key, other label: kept
      KgEdge.make("e1", "a", "c", "phosphorylation", Props.empty),
      KgEdge.make("e1", "x", "y", "phosphorylation", Props.empty), // same relId: dropped
    )
    assert(Dedup.edges(spark.createDataset(es)).count() == 3)
  }

  test("cypher query translation + reverse (test_translate.py:472-490)") {
    val q = "MATCH (n:protein) RETURN n"
    assert(ctx.translateQuery(q) == "MATCH (n:Protein) RETURN n")
    assert(ctx.translateQuery("MATCH ()-[r:gene_disease]-() RETURN r") ==
      "MATCH ()-[r:PERTURBED_IN_DISEASE]-() RETURN r")
    assert(ctx.reverseTranslateQuery("MATCH (n:Protein) RETURN n") ==
      "MATCH (n:protein) RETURN n")
    // many-to-one is not reversible
    intercept[UnsupportedOperationException] {
      ctx.reverseTranslateQuery("MATCH (n:PERTURBED_IN_DISEASE) RETURN n")
    }
  }

  test("strict mode rejects nodes without source/licence/version") {
    val strictCtx = KgContext.build(
      TestFixtures.resource("test_schema.yaml"),
      TestFixtures.resource("biolink_mini.ttl"),
      "entity",
      config = KgConfig(strictMode = true),
    )
    val sbc = spark.sparkContext.broadcast(strictCtx)
    val bad = spark.createDataset(Seq(RawNode("p1", "protein", Props.empty)))
    val ex = intercept[Exception] { Translate.nodes(bad, sbc).collect() }
    assert(ex.getMessage.contains("Strict mode"))
    val good = spark.createDataset(Seq(RawNode("p1", "protein", Props.of(
      "source" -> PV.str("s"), "licence" -> PV.str("l"), "version" -> PV.str("v")))))
    assert(Translate.nodes(good, sbc).count() == 1)
  }
}
