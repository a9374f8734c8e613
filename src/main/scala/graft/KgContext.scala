package graft

import scala.collection.immutable.ListMap
import graft.model.Naming
import graft.ontology.{Ontology, OntologySource, TurtleLite}
import graft.schema.{ClassSpec, SchemaExpander}

/** Sink/format configuration (reference defaults:
  * biocypher/_config/biocypher_config.yaml:85-87). */
final case class KgConfig(
    delimiter: String = ";",
    arrayDelimiter: String = "|",
    quote: String = "'",
    labelsOrder: String = "Ascending",
    strictMode: Boolean = false,
    dbName: String = "neo4j",
    wipe: Boolean = true,
    skipBadRelationships: Boolean = false,
    skipDuplicateNodes: Boolean = false,
    importCallBinPrefix: Option[String] = None,
    importCallFilePrefix: Option[String] = None,
    batchSize: Long = 1000000L,
)

/** Everything the distributed stages need, derived once on the driver from
  * the schema config + ontology sources, then broadcast. Small (schema
  * classes number 10^1-10^3), fully serializable.
  */
final class KgContext(
    val extendedSchema: SchemaExpander.Schema,
    val specs: ListMap[String, ClassSpec],
    val inputLabelToClass: Map[String, String],
    val ancestors: Map[String, List[String]], // class -> PascalCase ancestor labels, ordered
    val queryMappings: Map[String, String],
    val reverseQueryMappings: Map[String, List[String]],
    val config: KgConfig,
) extends Serializable {

  def spec(cls: String): Option[ClassSpec] = specs.get(cls)

  /** Reverse lookup: edge output label (label_as_edge) -> schema class. */
  lazy val labelAsEdgeToClass: Map[String, String] =
    specs.collect { case (k, s) if s.labelAsEdge.isDefined => s.labelAsEdge.get -> k }

  /** Schema class for an edge's output label (reference:
    * _batch_writer.py:858-902): the label itself if it is a schema class,
    * else via label_as_edge. */
  def schemaClassForEdgeLabel(label: String): Option[String] =
    if (specs.contains(label)) Some(label) else labelAsEdgeToClass.get(label)

  /** Ancestor-labels cell for a node class: PascalCase closure joined as a
    * quoted array string; single Pascal label when no closure is known
    * (reference: _batch_writer.py:477-514). */
  def labelsCell(cls: String): String =
    ancestors.get(cls).filter(_.nonEmpty) match {
      case Some(anc) => Render.quote(anc.mkString(config.arrayDelimiter), config.quote)
      case None      => Naming.nameSentenceToPascal(cls)
    }

  /** Single-term translation: input label -> ontology label, None when
    * unmapped (reference: _translate.py:369-374). */
  def translateTerm(term: String): Option[String] = queryMappings.get(term)

  /** Single-term reverse translation: ontology label -> input label(s)
    * (reference: _translate.py:376-381). */
  def reverseTranslateTerm(term: String): Option[List[String]] =
    reverseQueryMappings.get(term)

  /** Cypher query label rewrite (reference: _translate.py:383-396). */
  def translateQuery(query: String): String =
    queryMappings.foldLeft(query) { case (q, (k, v)) => q.replace(":" + k, ":" + v) }

  /** Reverse rewrite; many-to-one mappings are not reversible
    * (reference: _translate.py:398-413). */
  def reverseTranslateQuery(query: String): String =
    reverseQueryMappings.foldLeft(query) { case (q, (k, vs)) =>
      val a = ":" + k + ")"
      val b = ":" + k + "]"
      if (q.contains(a) || q.contains(b)) {
        if (vs.length > 1)
          throw new UnsupportedOperationException(
            s"Reverse translation of multiple inputs not implemented yet. ($k -> $vs)")
        q.replace(a, ":" + vs.head + ")").replace(b, ":" + vs.head + "]")
      } else q
    }
}

object KgContext {

  /** Build the full context: parse + expand schema, parse + hybridise
    * ontology, precompute closures. Pure driver-side work. */
  def build(
      schemaYaml: String,
      headOntologyTtl: String,
      rootLabel: String,
      tails: List[(String, String, String, Boolean)] = Nil, // (ttl, tailJoinRoot, headJoin, merge)
      config: KgConfig = KgConfig(),
  ): KgContext = {
    val schema = SchemaExpander.parseYaml(schemaYaml)
    val extended = SchemaExpander.extend(schema)
    val ontology = Ontology.fromTtl(headOntologyTtl, rootLabel, extended, tails)
    fromParts(extended, ontology, config)
  }

  def fromParts(
      extended: SchemaExpander.Schema,
      ontology: Ontology,
      config: KgConfig,
  ): KgContext = {
    val (fwd, rev) = SchemaExpander.translationMappings(extended)
    new KgContext(
      extendedSchema = extended,
      specs = SchemaExpander.specs(extended),
      inputLabelToClass = SchemaExpander.inputLabelMap(extended),
      ancestors = ontology.ancestorClosure(config.labelsOrder),
      queryMappings = fwd,
      reverseQueryMappings = rev,
      config = config,
    )
  }
}

/** CSV cell rendering helpers shared by the sinks. */
object Render {
  /** Quote with quote-doubling escape (reference: graph/_neo4j.py:47-52). */
  def quote(value: String, q: String): String =
    q + value.replace(q, q + q) + q

  /** Array string: delimiter-join then quote
    * (reference: graph/_neo4j.py:54-68). */
  def arrayString(items: Seq[String], adelim: String, q: String): String =
    quote(items.mkString(adelim), q)
}
