package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Naming, Py, PV}

/** Mirrors reference test/test_misc.py + the case-conversion behaviors
  * exercised across test_translate.py. */
class NamingSpec extends AnyFunSuite {

  test("sentence to pascal") {
    assert(Naming.sentenceToPascal("post translational interaction") == "PostTranslationalInteraction")
    assert(Naming.sentenceToPascal("protein") == "Protein")
    assert(Naming.sentenceToPascal("microRNA") == "MicroRNA")
    assert(Naming.sentenceToPascal("biological entity") == "BiologicalEntity")
  }

  test("dotted virtual-leaf names convert per segment") {
    assert(Naming.nameSentenceToPascal("reactome.pathway") == "Reactome.Pathway")
    assert(Naming.nameSentenceToPascal("clinically relevant.sequence variant") ==
      "ClinicallyRelevant.SequenceVariant")
  }

  test("pascal to sentence") {
    assert(Naming.pascalToSentence("BiologicalEntity") == "biological entity")
    assert(Naming.pascalToSentence("MicroRNA") == "microrna")
    assert(Naming.pascalToSentence("Protein") == "protein")
  }

  test("lower sentence case") {
    assert(Naming.toLowerSentenceCase("Known_variant") == "known variant")
    assert(Naming.toLowerSentenceCase("Sequence Variant") == "sequence variant")
    assert(Naming.toLowerSentenceCase("SequenceVariant") == "sequence variant")
    assert(Naming.toLowerSentenceCase("entity") == "entity")
    assert(Naming.toLowerSentenceCase("None") == "none")
  }

  test("neo4j label sanitization (reference _batch_writer.py:1008-1040)") {
    assert(Naming.parseLabel("gene") == "gene")
    assert(Naming.parseLabel("gene-disease*") == "genedisease")
    assert(Naming.parseLabel("1gene") == "gene")
    assert(Naming.parseLabel("$gene") == "$gene")
    assert(Naming.parseLabel("my label.v2") == "my label.v2")
  }

  test("python float repr parity") {
    assert(Py.repr(4.0) == "4.0")
    assert(Py.repr(-1.0) == "-1.0")
    assert(Py.repr(0.5) == "0.5")
    assert(Py.repr(9606.0) == "9606.0")
    assert(Py.repr(3.14159) == "3.14159")
    assert(Py.repr(0.0001) == "0.0001")
    assert(Py.repr(0.00001) == "1e-05")
    assert(Py.repr(1e15) == "1000000000000000.0")
    assert(Py.repr(1e16) == "1e+16")
    assert(Py.repr(1.5e20) == "1.5e+20")
    assert(Py.repr(0.0) == "0.0")
    assert(Py.repr(0.1) == "0.1")
    assert(Py.repr(1.0 / 3.0) == "0.3333333333333333")
  }

  test("string sanitization strips newlines (reference _create.py:73-102)") {
    assert(PV.str("a\nb").s == "a b")
    assert(PV.str("a\r\nb").s == "a b")
    assert(PV.arr(Seq("x\ny")).arr == Seq("x y"))
  }
}
