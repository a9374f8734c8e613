package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.schema._

/** Mirrors reference test/test_mapping.py + schema parts of
  * test_translate.py (virtual leaves, inheritance, loop guard). */
class SchemaSpec extends AnyFunSuite {

  lazy val yaml: String = TestFixtures.resource("test_schema.yaml")
  lazy val extended: SchemaExpander.Schema =
    SchemaExpander.extend(SchemaExpander.parseYaml(yaml))
  lazy val specs = SchemaExpander.specs(extended)

  test("yaml subset parser handles nested maps, inline and multiline lists") {
    val parsed = SchemaExpander.parseYaml(yaml)
    assert(parsed.contains("protein"))
    val protein = parsed("protein")
    assert(protein("preferred_id") == YS("uniprot"))
    assert(protein("properties").asInstanceOf[YM].m("genes") == YS("str[]"))
    val v2g = parsed("variant to gene association")
    assert(Y.strings(v2g("input_label")) ==
      List("VARIANT_FOUND_IN_GENE_Known_variant_Gene", "VARIANT_FOUND_IN_GENE_Somatic_mutation_Gene"))
    assert(parsed("dsDNA sequence")("inherit_properties") == YB(true))
  }

  test("virtual leaves for multi preferred_id (reference test_translate.py:292-304)") {
    assert(extended.contains("reactome.pathway"))
    assert(extended.contains("wikipathways.pathway"))
    val leaf = specs("reactome.pathway")
    assert(leaf.virtual)
    assert(leaf.preferredId == "reactome")
    assert(leaf.inputLabels == List("reactome"))
    assert(leaf.isA == List("pathway"))
  }

  test("virtual leaves for sequence variant (3 pids)") {
    assert(extended.contains("clinically relevant.sequence variant"))
    assert(extended.contains("known.sequence variant"))
    assert(extended.contains("somatic.sequence variant"))
    val known = specs("known.sequence variant")
    assert(known.inputLabels == List("Known_variant"))
    // non-core attrs (properties) are inherited into the leaf
    assert(known.properties.keySet == Set("source", "original_source", "effect", "biotype"))
  }

  test("source-scoped virtual leaves") {
    assert(extended.contains("known.sequence variant.variant to gene association"))
    assert(extended.contains("somatic.sequence variant.variant to gene association"))
    val l = specs("known.sequence variant.variant to gene association")
    assert(l.inputLabels == List("VARIANT_FOUND_IN_GENE_Known_variant_Gene"))
    assert(l.isA == List("variant to gene association"))
  }

  test("vertical property inheritance (dsDNA inherits DNA sequence props)") {
    val ds = specs("dsDNA sequence")
    assert(ds.properties.keySet == Set("ac", "fullName", "shortName", "preferredName", "sequence"))
    // and its virtual leaves carry them too
    val leaf = specs("intact.dsDNA sequence")
    assert(leaf.properties.keySet == Set("ac", "fullName", "shortName", "preferredName", "sequence"))
    assert(leaf.isA == List("dsDNA sequence", "DNA sequence", "nucleic acid entity"))
  }

  test("self-loop entries are dropped (reference _mapping.py:82-88)") {
    assert(!extended.contains("gene to variant association"))
  }

  test("input label map: virtual leaves override parent for shared labels") {
    val m = SchemaExpander.inputLabelMap(extended)
    assert(m("reactome") == "reactome.pathway")
    assert(m("protein") == "protein")
    assert(m("mirna") == "microRNA")
    assert(m("hgnc") == "gene")
    assert(m("ensg") == "gene")
    assert(m("gene_disease") == "gene to disease association")
    assert(m("Known_variant") == "known.sequence variant")
  }

  test("translation mappings prefer label_as_edge") {
    val (fwd, rev) = SchemaExpander.translationMappings(extended)
    assert(fwd("gene_disease") == "PERTURBED_IN_DISEASE")
    assert(fwd("protein") == "Protein")
    assert(fwd("post_translational") == "INTERACTS_POST_TRANSLATIONAL")
    assert(rev("Protein") == List("protein"))
  }

  test("defaults: preferred_id id when absent") {
    val phos = specs("phosphorylation")
    assert(phos.preferredId == "id")
    assert(phos.representedAs == "edge")
  }
}

object TestFixtures {
  def resource(name: String): String = {
    val in = getClass.getClassLoader.getResourceAsStream(s"graft/$name")
    require(in != null, s"missing test resource $name")
    try new String(in.readAllBytes(), "UTF-8")
    finally in.close()
  }
}
