package graft.corpus

import graft.{KgConfig, KgContext}
import graft.extract.{DictEntry, MentionDict}

/** The demo knowledge domain used over the driver's `documents` test table:
  * an "analytics concepts" ontology whose surface forms are the synthetic
  * corpus vocabulary. Plays the role BioCypher's biomedical ontologies play
  * for real corpora — everything (schema, ontology, dictionary) flows
  * through exactly the same machinery.
  */
object AnalyticsDomain {

  val schemaYaml: String =
    """relational operator:
      |  represented_as: node
      |  preferred_id: op
      |  input_label: relational operator
      |  properties:
      |    name: str
      |storage structure:
      |  represented_as: node
      |  preferred_id: store
      |  input_label: storage structure
      |  properties:
      |    name: str
      |execution engine:
      |  represented_as: node
      |  preferred_id: engine
      |  input_label: execution engine
      |  properties:
      |    name: str
      |workload:
      |  represented_as: node
      |  preferred_id: load
      |  input_label: workload
      |  properties:
      |    name: str
      |document:
      |  represented_as: node
      |  preferred_id: doc
      |  input_label: document
      |mention:
      |  is_a: association
      |  represented_as: edge
      |  label_as_edge: MENTIONS
      |  input_label: mentions
      |co occurrence:
      |  is_a: association
      |  represented_as: edge
      |  label_as_edge: COOCCURS_WITH
      |  input_label: cooccurs
      |derivation:
      |  is_a: association
      |  represented_as: node
      |  input_label: derives
      |  properties:
      |    directed: bool
      |    effect: int
      |""".stripMargin

  val ontologyTtl: String =
    """@prefix : <https://example.org/analytics/> .
      |@prefix owl: <http://www.w3.org/2002/07/owl#> .
      |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
      |:Entity a owl:Class ; rdfs:label "entity" .
      |:Association a owl:Class ; rdfs:subClassOf :Entity ; rdfs:label "association" .
      |:Operation a owl:Class ; rdfs:subClassOf :Entity ; rdfs:label "operation" .
      |:RelationalOperator a owl:Class ; rdfs:subClassOf :Operation ; rdfs:label "relational operator" .
      |:Workload a owl:Class ; rdfs:subClassOf :Operation ; rdfs:label "workload" .
      |:Artifact a owl:Class ; rdfs:subClassOf :Entity ; rdfs:label "artifact" .
      |:StorageStructure a owl:Class ; rdfs:subClassOf :Artifact ; rdfs:label "storage structure" .
      |:ExecutionEngine a owl:Class ; rdfs:subClassOf :Artifact ; rdfs:label "execution engine" .
      |:Document a owl:Class ; rdfs:subClassOf :Artifact ; rdfs:label "document" .
      |:Derivation a owl:Class ; rdfs:subClassOf :Association ; rdfs:label "derivation" .
      |""".stripMargin

  /** (surface form, class input_label, curie prefix). Deterministic order. */
  val dictionary: Vector[(String, String, String)] = Vector(
    "scan" -> "relational operator", "join" -> "relational operator",
    "filter" -> "relational operator", "sort" -> "relational operator",
    "group" -> "relational operator", "agg" -> "relational operator",
    "merge" -> "relational operator", "window" -> "relational operator",
    "order" -> "relational operator",
    "table" -> "storage structure", "row" -> "storage structure",
    "column" -> "storage structure", "part" -> "storage structure",
    "key" -> "storage structure", "value" -> "storage structure",
    "hash" -> "storage structure", "vector" -> "storage structure",
    "line" -> "storage structure",
    "spark" -> "execution engine",
    "query" -> "workload", "batch" -> "workload", "stream" -> "workload",
  ).map { case (s, c) =>
    val prefix = c match {
      case "relational operator" => "op"
      case "storage structure"   => "store"
      case "execution engine"    => "engine"
      case "workload"            => "load"
    }
    (s, c, s"$prefix:$s")
  }

  def dict: MentionDict =
    MentionDict.build(dictionary.map { case (s, c, cu) => DictEntry(s, cu, c, 1.0) })

  def context(config: KgConfig = KgConfig()): KgContext =
    KgContext.build(schemaYaml, ontologyTtl, "entity", config = config)

  /** Synthetic-corpus vocabulary: dictionary terms + filler words (mirrors
    * the driver table's vocabulary). */
  val vocab: IndexedSeq[String] =
    dictionary.map(_._1) ++ Vector("a", "the", "big", "small", "fast", "slow",
      "data", "customer", "dup")
}
