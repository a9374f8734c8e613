package graft.ontology

import scala.collection.mutable

/** A parsed Turtle document reduced to what ontology construction consumes:
  * triples over expanded IRIs, literal objects, and RDF collections.
  * (The reference consumes only rdfs:subClassOf, rdfs:label,
  * owl:intersectionOf and owl:equivalentClass triples —
  * reference: biocypher/_ontology.py:113-199.)
  */
final case class TtlDoc(
    triples: Vector[(String, String, String)], // (subj, pred, obj); literals prefixed with '"'
    collections: Map[String, List[String]],    // collection bnode -> item IRIs
) {
  def objects(s: String, p: String): List[String] =
    triples.collect { case (`s`, `p`, o) => o }.toList
  def subjects(p: String, o: String): List[String] =
    triples.collect { case (s, `p`, `o`) => s }.toList
  def literal(o: String): Option[String] =
    if (o.startsWith("\"")) Some(o.substring(1)) else None
}

object TtlVocab {
  val SubClassOf = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
  val Label = "http://www.w3.org/2000/01/rdf-schema#label"
  val IntersectionOf = "http://www.w3.org/2002/07/owl#intersectionOf"
  val EquivalentClass = "http://www.w3.org/2002/07/owl#equivalentClass"
  val Type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
}

/** Minimal Turtle subset parser: @prefix/@base, statements with `;`/`,`
  * continuation, `a` keyword, IRIs (<..> and prefixed), string literals
  * (with optional @lang / ^^type suffix), blank nodes `[ ... ]`, and
  * collections `( ... )`. Enough for the ontology fixtures this engine
  * consumes; intentionally not a general RDF library.
  */
object TurtleLite {

  def parse(text: String): TtlDoc = new Parser(text).parseDoc()

  private final class Parser(text: String) {
    private var pos = 0
    private val prefixes = mutable.Map[String, String]()
    private var base = ""
    private var bnodeCounter = 0
    private val triples = Vector.newBuilder[(String, String, String)]
    private val colls = mutable.Map[String, List[String]]()

    def parseDoc(): TtlDoc = {
      skipWs()
      while (pos < text.length) {
        if (peekWord("@prefix")) parsePrefix()
        else if (peekWord("@base")) parseBase()
        else parseStatement()
        skipWs()
      }
      TtlDoc(triples.result(), colls.toMap)
    }

    private def parsePrefix(): Unit = {
      expectWord("@prefix"); skipWs()
      val name = readUntil(':'); pos += 1 // consume ':'
      skipWs()
      val iri = readIriRef()
      skipWs(); expectChar('.')
      prefixes(name) = iri
    }

    private def parseBase(): Unit = {
      expectWord("@base"); skipWs()
      base = readIriRef()
      skipWs(); expectChar('.')
    }

    private def parseStatement(): Unit = {
      val subj = parseNode()
      parsePredicateObjectList(subj)
      skipWs(); expectChar('.')
    }

    private def parsePredicateObjectList(subj: String): Unit = {
      var more = true
      while (more) {
        skipWs()
        val pred = parsePredicate()
        var moreObj = true
        while (moreObj) {
          skipWs()
          val obj = parseNode()
          triples += ((subj, pred, obj))
          skipWs()
          if (peekChar(',')) { pos += 1 } else moreObj = false
        }
        skipWs()
        if (peekChar(';')) {
          pos += 1; skipWs()
          // trailing ';' before '.' or ']' is legal
          if (peekChar('.') || peekChar(']')) more = false
        } else more = false
      }
    }

    private def parsePredicate(): String = {
      if (peekWord("a") && (pos + 1 >= text.length || !isNameChar(text.charAt(pos + 1)))) {
        pos += 1; TtlVocab.Type
      } else parseIri()
    }

    private def parseNode(): String = {
      skipWs()
      val c = text.charAt(pos)
      if (c == '<') parseIri()
      else if (c == '"') parseLiteral()
      else if (c == '[') parseBlank()
      else if (c == '(') parseCollection()
      else if (c == '_') parseBlankLabel()
      else parseIri()
    }

    private def parseBlank(): String = {
      expectChar('[')
      bnodeCounter += 1
      val id = s"_:b$bnodeCounter"
      skipWs()
      if (!peekChar(']')) parsePredicateObjectList(id)
      skipWs(); expectChar(']')
      id
    }

    private def parseBlankLabel(): String = {
      val start = pos
      while (pos < text.length && (isNameChar(text.charAt(pos)) || text.charAt(pos) == ':')) pos += 1
      text.substring(start, pos)
    }

    private def parseCollection(): String = {
      expectChar('(')
      bnodeCounter += 1
      val id = s"_:c$bnodeCounter"
      val items = mutable.ListBuffer[String]()
      skipWs()
      while (!peekChar(')')) { items += parseNode(); skipWs() }
      expectChar(')')
      colls(id) = items.toList
      id
    }

    private def parseLiteral(): String = {
      expectChar('"')
      val sb = new StringBuilder
      while (pos < text.length && text.charAt(pos) != '"') {
        if (text.charAt(pos) == '\\' && pos + 1 < text.length) {
          pos += 1
          sb.append(text.charAt(pos) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'; case other => other
          })
        } else sb.append(text.charAt(pos))
        pos += 1
      }
      expectChar('"')
      // optional @lang or ^^datatype
      if (peekChar('@')) { pos += 1; while (pos < text.length && isNameChar(text.charAt(pos))) pos += 1 }
      else if (pos + 1 < text.length && text.charAt(pos) == '^' && text.charAt(pos + 1) == '^') {
        pos += 2; parseIri()
      }
      "\"" + sb.toString
    }

    private def parseIri(): String = {
      skipWs()
      if (text.charAt(pos) == '<') readIriRef()
      else {
        val start = pos
        while (pos < text.length && isNameChar(text.charAt(pos))) pos += 1
        val ns = text.substring(start, pos)
        expectChar(':')
        val lstart = pos
        while (pos < text.length && isNameChar(text.charAt(pos))) pos += 1
        val local = text.substring(lstart, pos)
        prefixes.get(ns) match {
          case Some(uri) => uri + local
          case None      => base + local
        }
      }
    }

    private def readIriRef(): String = {
      expectChar('<')
      val s = readUntil('>')
      pos += 1
      s
    }

    private def isNameChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.'

    private def readUntil(stop: Char): String = {
      val start = pos
      while (pos < text.length && text.charAt(pos) != stop) pos += 1
      text.substring(start, pos)
    }

    private def skipWs(): Unit = {
      var go = true
      while (go && pos < text.length) {
        val c = text.charAt(pos)
        if (c.isWhitespace) pos += 1
        else if (c == '#') { while (pos < text.length && text.charAt(pos) != '\n') pos += 1 }
        else go = false
      }
    }

    private def peekChar(c: Char): Boolean = pos < text.length && text.charAt(pos) == c
    private def peekWord(w: String): Boolean = text.regionMatches(pos, w, 0, w.length)
    private def expectWord(w: String): Unit = {
      require(peekWord(w), s"expected '$w' at ${text.substring(pos, math.min(pos + 30, text.length))}")
      pos += w.length
    }
    private def expectChar(c: Char): Unit = {
      require(peekChar(c), s"expected '$c' at ...${text.substring(math.max(0, pos - 10), math.min(pos + 20, text.length))}")
      pos += 1
    }
  }
}
