package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ontology._
import graft.schema.SchemaExpander

/** Mirrors reference test/test_ontology.py behaviors on our own fixtures. */
class OntologySpec extends AnyFunSuite {

  lazy val headTtl: String = TestFixtures.resource("biolink_mini.ttl")
  lazy val schemaYaml: String = TestFixtures.resource("test_schema.yaml")
  lazy val extended = SchemaExpander.extend(SchemaExpander.parseYaml(schemaYaml))
  lazy val onto = Ontology.fromTtl(headTtl, "entity", extended)

  test("turtle subset parser: labels, subClassOf, prefixes") {
    val doc = TurtleLite.parse(headTtl)
    val src = new OntologySource(doc, "entity")
    assert(src.graph.hasNode("protein"))
    assert(src.graph.parents("protein") == List("polypeptide"))
    assert(src.graph.parents("microRNA") == List("nucleic acid entity"))
    assert(src.graph.attr("protein", "label").contains("Protein"))
  }

  test("unlabeled nodes are dropped (reference missing_label.ttl behavior)") {
    val ttl =
      """@prefix : <http://x/> .
        |@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |:Root a owl:Class ; rdfs:label "Root" .
        |:A a owl:Class ; rdfs:label "Label_A" ; rdfs:subClassOf :Root .
        |:B a owl:Class ; rdfs:subClassOf :Root .
        |""".stripMargin
    val src = new OntologySource(TurtleLite.parse(ttl), "Root")
    assert(src.graph.hasNode("label a"))
    assert(!src.graph.nodes.keys.exists(_.contains("B")))
  }

  test("owl:intersectionOf multiple parents (reference multiple_parent_nodes.ttl)") {
    val ttl =
      """@prefix : <http://x/> .
        |@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |:Root a owl:Class ; rdfs:label "Root" .
        |:L1A a owl:Class ; rdfs:label "Level1A" ; rdfs:subClassOf :Root .
        |:L1B a owl:Class ; rdfs:label "Level1B" ; rdfs:subClassOf :Root .
        |:Child a owl:Class ; rdfs:label "Child" ;
        |  rdfs:subClassOf [ owl:intersectionOf ( :L1A :L1B ) ; rdf:type owl:Class ] .
        |""".stripMargin
    val src = new OntologySource(TurtleLite.parse(ttl), "Root")
    // "Level1A" keeps the trailing capital: the lone-"A" letter run has no
    // lowercase char so the reference's lowercase pass leaves it (tested
    // against python: to_lower_sentence_case("Level1A") == "level1A")
    assert(src.graph.parents("child").toSet == Set("level1A", "level1B"))
  }

  test("switch_label_and_id = false keeps identifiers as node keys") {
    val ttl =
      """@prefix : <http://x/> .
        |@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |:ID_0 a owl:Class ; rdfs:label "Label_Root" .
        |:ID_1 a owl:Class ; rdfs:label "Label_Level1A" ; rdfs:subClassOf :ID_0 .
        |""".stripMargin
    val src = new OntologySource(TurtleLite.parse(ttl), "Label_Root", switchLabelAndId = false)
    assert(src.graph.hasNode("ID_1"))
    assert(src.graph.attr("ID_1", "label").contains("label level1a"))
  }

  test("root filtering drops classes not under the root") {
    val ttl =
      """@prefix : <http://x/> .
        |@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |:Root a owl:Class ; rdfs:label "root" .
        |:A a owl:Class ; rdfs:label "a node" ; rdfs:subClassOf :Root .
        |:X a owl:Class ; rdfs:label "orphan" ; rdfs:subClassOf :Other .
        |:Other a owl:Class ; rdfs:label "other" .
        |""".stripMargin
    val src = new OntologySource(TurtleLite.parse(ttl), "root")
    assert(src.graph.hasNode("a node"))
    assert(!src.graph.hasNode("orphan"))
    assert(!src.graph.hasNode("other"))
  }

  test("hybridisation: tail subtree merged at join node") {
    val head =
      """@prefix : <http://x/> .
        |@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |:Thing a owl:Class ; rdfs:label "Thing" .
        |:Entity a owl:Class ; rdfs:label "entity" ; rdfs:subClassOf :Thing .
        |""".stripMargin
    val tail =
      """@prefix : <http://y/> .
        |@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |:Criterion a owl:Class ; rdfs:label "EvaluationCriterion" .
        |:Accuracy a owl:Class ; rdfs:label "Accuracy" ; rdfs:subClassOf :Criterion .
        |""".stripMargin
    // merge: tail join node renamed to head join node
    val o = Ontology.fromTtl(head, "Thing",
      tails = List((tail, "EvaluationCriterion", "entity", true)))
    assert(o.graph.hasNode("accuracy"))
    assert(o.graph.parents("accuracy") == List("entity"))
    assert(!o.graph.hasNode("evaluation criterion"))
    // attach: tail join node kept as child of head join node
    val o2 = Ontology.fromTtl(head, "Thing",
      tails = List((tail, "EvaluationCriterion", "entity", false)))
    assert(o2.graph.parents("accuracy") == List("evaluation criterion"))
    assert(o2.graph.parents("evaluation criterion") == List("entity"))
  }

  test("user extension along is_a chain + ancestors closure") {
    // side effect -> phenotypic feature (ontology) -> biological entity ...
    val anc = onto.getAncestors("side effect")
    assert(anc.head == "side effect")
    assert(anc.contains("phenotypic feature"))
    assert(anc.contains("biological entity"))
    assert(anc.contains("entity"))
    // multi-is_a chain: mutation to tissue association walks the chain
    val anc2 = onto.getAncestors("mutation to tissue association")
    assert(anc2.containsSlice(List("genotype to tissue association", "entity to tissue association", "association")))
  }

  test("synonym_for relabels ontology node (complex)") {
    assert(onto.graph.hasNode("complex"))
    assert(!onto.graph.hasNode("macromolecular complex"))
    val anc = onto.getAncestors("complex")
    assert(anc.head == "complex")
    assert(anc.contains("biological entity"))
  }

  test("missing class without is_a raises") {
    val ex = intercept[IllegalArgumentException] {
      val bad = SchemaExpander.extend(SchemaExpander.parseYaml(
        "nonexistent thing:\n  represented_as: node\n  input_label: x\n"))
      Ontology.fromTtl(headTtl, "entity", bad)
    }
    assert(ex.getMessage.contains("not found in ontology"))
  }

  test("ancestor closure is PascalCase, specific to generic") {
    val closure = onto.ancestorClosure()
    val p = closure("protein")
    assert(p.head == "Protein")
    assert(p.contains("BiologicalEntity"))
    assert(p.last == "Entity")
    val m = closure("microRNA")
    assert(m.head == "MicroRNA")
    assert(m.contains("ChemicalEntity"))
    // virtual leaf closure goes through its parent chain
    val r = closure("reactome.pathway")
    assert(r.head == "Reactome.Pathway")
    assert(r.contains("Pathway"))
    assert(r.contains("BiologicalEntity"))
  }

  test("labels_order variants") {
    val asc = onto.ancestorClosure("Ascending")("protein")
    val desc = onto.ancestorClosure("Descending")("protein")
    val alpha = onto.ancestorClosure("Alphabetical")("protein")
    val leaves = onto.ancestorClosure("Leaves")("protein")
    assert(desc == asc.reverse)
    assert(alpha == asc.sorted)
    assert(leaves == List("Protein"))
  }

  test("show_ontology_structure: schema-restricted ASCII tree with synonym tags") {
    val tree = onto.showOntologyStructure()
    val lines = tree.linesIterator.toList
    assert(lines.head == "entity")
    // schema classes and their ancestor chains are present, nested
    assert(lines.exists(_.matches(".*[├└]── biological entity")))
    assert(lines.exists(_.endsWith(" protein")))
    // deeper nesting is further indented than its parent
    val bio = lines.indexWhere(_.endsWith("biological entity"))
    val prot = lines.indexWhere(_.endsWith(" protein"))
    assert(bio >= 0 && prot > bio)
    // synonym_for renders as "node = target" (reference tag rewrite)
    assert(tree.contains("complex = macromolecular complex"))
    // full=false without schema raises
    val bare = Ontology.fromTtl(headTtl, "entity")
    intercept[IllegalArgumentException](bare.showOntologyStructure())
    assert(bare.showOntologyStructure(full = true).startsWith("entity"))
  }

  test("writeGraphml emits the ontology_structure.graphml artifact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gml-")
    val p = java.nio.file.Paths.get(
      new java.net.URI(onto.writeGraphml(dir.toString)).getPath)
    val xml = java.nio.file.Files.readString(p)
    assert(p.getFileName.toString == "ontology_structure.graphml")
    assert(xml.contains("<graphml"))
    assert(xml.contains("<node id=\"protein\">"))
    assert(xml.contains("<edge source=\"protein\""))
  }
}
