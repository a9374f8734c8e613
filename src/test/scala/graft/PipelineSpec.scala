package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.{AnalyticsDomain, Corpus}
import graft.extract.{AhoCorasick, DictEntry, MentionDict, Mentions}

class PipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("aho-corasick finds overlapping + whole-word matches") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    val all = ac.findAll("ushers").toList.map { case (s, p) => (s, ac.patterns(p)) }
    assert(all.toSet == Set((1, "she"), (2, "he"), (2, "hers")))
    val ww = AhoCorasick.build(Seq("scan", "join"))
    assert(ww.findWholeWords("scan join rescan scanjoin scan").toList.map(_._1) == List(0, 5, 26))
  }

  test("synthetic corpus is deterministic and interleaved") {
    val a = Corpus.synthesize(spark, 50, AnalyticsDomain.vocab).collect()
    val b = Corpus.synthesize(spark, 50, AnalyticsDomain.vocab).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.exists(_.spans.exists(_.kind != "text")))
    a.foreach { d =>
      assert(d.spans.map(_.offset) == d.spans.map(_.offset).sorted)
      d.spans.foreach { s =>
        if (s.kind == "text") assert(s.text != null && s.media_ref == null)
        else assert(s.text == null && s.media_ref != null)
      }
    }
  }

  test("span-sequence invariant: signature stable through parquet round-trip") {
    val docs = Corpus.synthesize(spark, 30, AnalyticsDomain.vocab)
    val tmp = java.nio.file.Files.createTempDirectory("graft-docs-").toString
    docs.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    assert(Mentions.invariantViolations(docs.toDF(), back) == 0)
  }

  test("mention detection links dictionary terms with provenance") {
    val docs = Seq(
      graft.model.Doc("d1", Seq(
        graft.model.Span("text", "scan the table fast", null, 0),
        graft.model.Span("image", null, "media://img/1", 1),
        graft.model.Span("text", "spark join", null, 2))),
      graft.model.Doc("d2", Seq(graft.model.Span("text", "no dictionary words here", null, 0))),
    ).toDS()
    val bc = spark.sparkContext.broadcast(AnalyticsDomain.dict)
    val ms = Mentions.detect(docs, bc).collect()
    val textMentions = ms.filter(_.cls != "media")
    assert(textMentions.map(m => (m.doc_id, m.curie)).toSet ==
      Set(("d1", "op:scan"), ("d1", "store:table"), ("d1", "engine:spark"), ("d1", "op:join")))
    // provenance: span offsets + kinds preserved
    assert(textMentions.filter(_.curie == "op:join").head.span_offset == 2)
    val media = ms.filter(_.cls == "media")
    assert(media.map(_.curie).toSet == Set("media://img/1"))
  }

  test("ambiguous surfaces resolve deterministically by prior then curie") {
    val d = MentionDict.build(Seq(
      DictEntry("scan", "b:scan", "clsB", 1.0),
      DictEntry("scan", "a:scan", "clsA", 1.0),
      DictEntry("scan", "c:scan", "clsC", 0.5),
    ))
    assert(d.linkFor(0).curie == "a:scan")
  }

  test("end-to-end pipeline: nodes, edges, triples are consistent") {
    val docs = Corpus.synthesize(spark, 200, AnalyticsDomain.vocab)
    val pipe = KgPipeline.analytics(spark)
    val (ns, es, ts) = pipe.run(docs)
    val nodes = ns.collect()
    val edges = es.collect()
    val triples = ts.collect()
    // every entity node id is a curie or a doc id
    assert(nodes.forall(n => n.id.contains(":") || n.id.startsWith("doc")))
    // node ids unique (global dedup)
    assert(nodes.map(_.id).distinct.length == nodes.length)
    // every mention edge endpoint exists in nodes
    val nodeIds = nodes.map(_.id).toSet
    val mentionEdges = edges.filter(_.label == "MENTIONS")
    assert(mentionEdges.nonEmpty)
    assert(mentionEdges.forall(e => nodeIds.contains(e.src) && nodeIds.contains(e.tgt)))
    // triples = one type triple per node + one per edge
    assert(triples.length == nodes.length + edges.length)
    val typeTriples = triples.filter(_.pred == "rdf:type")
    assert(typeTriples.length == nodes.length)
    // ancestors head = Pascal class
    assert(typeTriples.exists(_.obj == "RelationalOperator"))
    assert(typeTriples.exists(_.obj == "Document"))
    // cooccurrence edges are ordered pairs
    val cooc = edges.filter(_.label == "COOCCURS_WITH")
    assert(cooc.forall(e => e.src < e.tgt))
  }

  test("multimodal metadata plumbing is deterministic") {
    val docs = Corpus.synthesize(spark, 50, AnalyticsDomain.vocab)
    val meta = graft.ops.MultimodalOps.decodeMetadata(
      graft.ops.MultimodalOps.mediaSpans(docs)).collect()
    assert(meta.nonEmpty)
    meta.foreach { r =>
      assert(r.getAs[Long]("width") >= 0 && r.getAs[Long]("width") <= 255)
      assert(r.getAs[Long]("n_bytes") == 16)
    }
    // frame sampling only for video
    val frames = graft.ops.MultimodalOps.sampleFrames(
      graft.ops.MultimodalOps.decodeMetadata(graft.ops.MultimodalOps.mediaSpans(docs)))
    assert(frames.filter(col("frame_idx") < 0).count() == 0)
  }
}
