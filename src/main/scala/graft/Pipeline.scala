package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.AnalyticsDomain
import graft.dedup.Dedup
import graft.extract.{Mention, MentionDict, Mentions}
import graft.model._
import graft.model.Props.Props
import graft.translate.Translate

/** End-to-end KG construction over an interleaved document corpus
  * (the north-star pipeline): docs -> mention detection + entity linking
  * (broadcast Aho-Corasick) -> schema/ontology translation -> salted dedup
  * -> triples + node/edge tables.
  *
  * Shuffle budget: the whole pipeline has exactly THREE exchanges —
  * node dedup, edge dedup, and the co-occurrence aggregate. Everything
  * upstream (scan -> extract -> translate) is narrow and pipelined; the
  * ontology/dictionary sides are broadcast, never shuffled.
  */
final class KgPipeline(
    spark: SparkSession,
    ctx: KgContext,
    dict: MentionDict,
) extends Serializable {

  val bcCtx = spark.sparkContext.broadcast(ctx)
  val bcDict = spark.sparkContext.broadcast(dict)

  import spark.implicits._

  def mentions(docs: Dataset[Doc]): Dataset[Mention] = Mentions.detect(docs, bcDict)

  /** Entity + document nodes, translated and globally deduped. */
  def nodes(ms: Dataset[Mention]): Dataset[KgNode] = {
    val entityRaw = Mentions.toRawNodes(ms)
    val docRaw = ms.filter(col("cls") =!= "media")
      .select(col("doc_id")).distinct()
      .as[String].map(id => RawNode(id, "document", Props.empty))
    Dedup.nodes(Translate.nodes(entityRaw.union(docRaw), bcCtx))
  }

  /** MENTIONS edges (doc -> entity), translated and deduped per label. */
  def mentionEdges(ms: Dataset[Mention]): Dataset[KgEdge] = {
    val raw = Mentions.toMentionEdges(ms)
    val translated = Translate.edges(raw, bcCtx).filter(_.edge != null).map(_.edge)
    Dedup.edges(translated)
  }

  /** COOCCURS_WITH edges between entities sharing a doc (a < b). */
  def cooccurrenceEdges(ms: Dataset[Mention]): Dataset[KgEdge] = {
    val cooc = Mentions.cooccurrence(ms)
    val raw = cooc.select(col("src"), col("tgt"), col("n_docs")).as[(String, String, Long)]
      .map { case (s, t, n) => RawEdge(null, s, t, "cooccurs", Props.of("n_docs" -> PV.int(n))) }
    Translate.edges(raw, bcCtx).filter(_.edge != null).map(_.edge)
    // already distinct by construction (groupBy) — no extra dedup shuffle
  }

  /** The judged (subj, pred, obj) table: rdf:type triples for every node +
    * one triple per edge. */
  def triples(nodes: Dataset[KgNode], edges: Dataset[KgEdge]): Dataset[Triple] = {
    val bc = bcCtx
    val typeTriples = nodes.map { n =>
      Triple(n.id, "rdf:type", bc.value.ancestors.get(n.label)
        .flatMap(_.headOption)
        .getOrElse(graft.model.Naming.nameSentenceToPascal(n.label)))
    }
    val edgeTriples = edges.map(e => Triple(e.src, e.label, e.tgt))
    typeTriples.union(edgeTriples)
  }

  /** Full run: returns (nodes, mention+cooc edges, triples), all lazily
    * defined; caller decides what to materialize/cache. */
  def run(docs: Dataset[Doc]): (Dataset[KgNode], Dataset[KgEdge], Dataset[Triple]) = {
    val ms = mentions(docs)
    val ns = nodes(ms)
    val es = mentionEdges(ms).union(cooccurrenceEdges(ms))
    (ns, es, triples(ns, es))
  }
}

object KgPipeline {
  /** The standard demo pipeline over the analytics domain. */
  def analytics(spark: SparkSession, config: KgConfig = KgConfig()): KgPipeline =
    new KgPipeline(spark, AnalyticsDomain.context(config), AnalyticsDomain.dict)
}
