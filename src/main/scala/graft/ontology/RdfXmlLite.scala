package graft.ontology

import scala.collection.mutable
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node}

/** Minimal RDF/XML reader producing the same [[TtlDoc]] the Turtle parser
  * emits — OWL ontologies (Biolink, GO, SO, Mondo) ship as RDF/XML, and the
  * reference loads them via rdflib (reference: biocypher/_ontology.py:94-106,
  * fixtures test/ontologies/go.owl, so.owl, mondo.owl).
  *
  * Supported subset (all the OWL fixtures need):
  *  - node elements (`owl:Class`, `rdf:Description`, any typed element) with
  *    `rdf:about` / `rdf:ID` / `rdf:nodeID` / anonymous blank nodes;
  *  - property elements with `rdf:resource`, `rdf:nodeID`, nested node
  *    elements, `rdf:parseType="Collection"` (mapped to
  *    [[TtlDoc.collections]], the shape owl:intersectionOf consumes), and
  *    literal text content;
  *  - `xml:base`-relative IRI resolution (`#Foo`), with a caller-supplied
  *    fallback base for baseless documents.
  *
  * Intentionally not a general RDF library: no reification, no
  * rdf:parseType="Literal" XML canonicalization, no xml:lang graph scoping.
  */
object RdfXmlLite {

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  def parse(xml: String, fallbackBase: String = ""): TtlDoc = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // no DTDs at all: blocks file-read XXE AND internal-entity expansion
    // (billion-laughs) on untrusted OWL input; every supported fixture is
    // DTD-free, and a file that does carry one fails loudly here
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    dbf.setFeature("http://xml.org/sax/features/external-general-entities", false)
    dbf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val root = doc.getDocumentElement
    val base = Option(root.getAttribute("xml:base")).filter(_.nonEmpty)
      .getOrElse(fallbackBase)

    val triples = Vector.newBuilder[(String, String, String)]
    val colls = mutable.Map[String, List[String]]()
    var bnodeCounter = 0
    def freshBnode(pfx: String): String = { bnodeCounter += 1; s"_:$pfx$bnodeCounter" }

    def resolve(iri: String): String =
      if (iri.startsWith("#")) base + iri
      else if (iri.isEmpty) base
      else iri

    def qname(e: Element): String = {
      val ns = Option(e.getNamespaceURI).getOrElse("")
      ns + e.getLocalName
    }

    def childElements(e: Element): List[Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).iterator.map(nl.item)
        .collect { case el: Element => el }.toList
    }

    def attr(e: Element, local: String): Option[String] =
      Option(e.getAttributeNS(RdfNs, local)).filter(_.nonEmpty)

    /** Parse a node element, emit its triples, return its subject id. */
    def parseNodeElement(e: Element): String = {
      val subj = attr(e, "about").map(resolve)
        .orElse(attr(e, "ID").map(id => s"$base#$id"))
        .orElse(attr(e, "nodeID").map(id => s"_:$id"))
        .getOrElse(freshBnode("b"))
      val tpe = qname(e)
      if (tpe != RdfNs + "Description")
        triples += ((subj, TtlVocab.Type, tpe))
      childElements(e).foreach(p => parsePropertyElement(subj, p))
      subj
    }

    def parsePropertyElement(subj: String, p: Element): Unit = {
      val pred = qname(p)
      val resource = attr(p, "resource")
      val nodeId = attr(p, "nodeID")
      val parseType = attr(p, "parseType")
      val kids = childElements(p)
      val obj: String =
        if (resource.isDefined) resolve(resource.get)
        else if (nodeId.isDefined) s"_:${nodeId.get}"
        else if (parseType.contains("Collection")) {
          val c = freshBnode("c")
          colls(c) = kids.map(parseNodeElement)
          c
        } else if (kids.nonEmpty) parseNodeElement(kids.head)
        else "\"" + p.getTextContent
      triples += ((subj, pred, obj))
    }

    childElements(root).foreach(parseNodeElement)
    TtlDoc(triples.result(), colls.toMap)
  }

  /** Sniff the serialization: RDF/XML documents start with an XML preamble
    * or an rdf:RDF element; anything else is treated as Turtle. Mirrors the
    * reference's format-guessing convenience (rdflib `format=` argument). */
  def parseAuto(text: String, fallbackBase: String = ""): TtlDoc = {
    val head = text.dropWhile(_.isWhitespace)
    if (head.startsWith("<?xml") || head.startsWith("<rdf:RDF") || head.startsWith("<RDF"))
      parse(text, fallbackBase)
    else TurtleLite.parse(text)
  }
}
