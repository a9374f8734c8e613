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

  test("dense goto table is gated on state count; sparse fallback matches (ADVICE r5)") {
    // small ASCII dictionary: dense, and the sparse structures are dropped
    val small = AhoCorasick.build(Seq("scan", "join"))
    assert(small.isAsciiDense)
    // over-threshold ASCII dictionary: must NOT build the 512 B/state dense
    // table (1M states would be a ~0.5 GB broadcast) — and must still match
    val rng = new scala.util.Random(7)
    val big = (0 until 30000).map(_ => (0 until 12).map(_ => ('a' + rng.nextInt(26)).toChar).mkString).distinct
    val bigAc = AhoCorasick.build(big)
    assert(!bigAc.isAsciiDense, "state count above DenseMaxStates must fall back to sparse")
    val probe = s"${big.head} xyz ${big.last} ${big.head}x"
    val hits = bigAc.findWholeWords(probe).toList.map { case (s, p) => (s, bigAc.patterns(p)) }
    assert(hits.map(_._2).toSet.subsetOf(Set(big.head, big.last)))
    assert(hits.count(_._2 == big.head) == 1) // "${big.head}x" is not whole-word
  }

  test("LongLongMap stores key 0 and the rank-distinct contract raises on duplicates (ADVICE r5)") {
    import graft.extract.CoocCombine
    val m = new CoocCombine.LongLongMap(4)
    m.inc(0L); m.inc(0L); m.inc(5L)
    assert(m.size == 2)
    assert(m.iterator.toMap == Map(0L -> 2L, 5L -> 1L))
    // growth keeps biased keys intact (force several rehashes through 0)
    val g = new CoocCombine.LongLongMap(4)
    (0L until 100L).foreach(k => g.inc(k))
    g.inc(0L)
    assert(g.iterator.toMap == (0L until 100L).map(k => k -> (if (k == 0) 2L else 1L)).toMap)
    // duplicate rank in a pm row = contract violation, loud in both branches
    val su = Array.fill(300)(1.0)
    val dup = Array((0L << 32) | 3L, (0L << 32) | 2L, (1L << 32) | 1L)
    intercept[IllegalArgumentException] {
      CoocCombine.cappedSortedRanks(dup, su, maxEntities = 256)
    }
    intercept[IllegalArgumentException] {
      CoocCombine.cappedSortedRanks(dup ++ (2 until 260).map(r => (r.toLong << 32) | 1L), su, maxEntities = 256)
    }
  }

  test("occurrence counts saturate identically on string, compact and fused paths") {
    // can't build a >2^31-occurrence doc; assert the clamp constant is the
    // packed-long bound and that normal counts are untouched
    assert(Mentions.MaxOccurrencesPerDoc == 0x7fffffffL)
    val bc = spark.sparkContext.broadcast(AnalyticsDomain.dict)
    val docs = Seq(graft.model.Doc("d", Seq(
      graft.model.Span("text", "scan scan scan join", null, 0)))).toDS()
    val n = Mentions.detectPerDoc(docs, bc).collect().map(m => m.curie -> m.n).toMap
    assert(n("op:scan") == 3 && n("op:join") == 1)
  }

  test("dictionary-coded (compact) pipeline == string pipeline, end to end") {
    val docs = Corpus.synthesize(spark, 400, AnalyticsDomain.vocab).persist()
    val pipe = graft.KgPipeline.analytics(spark)
    val (ns, es, ts) = pipe.run(docs)
    val (nsC, esC, tsC) = pipe.runCompact(docs)
    assert(nsC.collect().toSet == ns.collect().toSet)
    assert(esC.collect().toSet == es.collect().toSet)
    assert(tsC.collect().toSet == ts.collect().toSet)
    docs.unpersist()
  }

  test("fused mention-set pipeline == string pipeline, end to end") {
    val docs = Corpus.synthesize(spark, 400, AnalyticsDomain.vocab).persist()
    val pipe = graft.KgPipeline.analytics(spark)
    val (ns, es, ts) = pipe.run(docs)
    val (nsF, esF, tsF) = pipe.runFused(docs)
    assert(nsF.collect().toSet == ns.collect().toSet)
    assert(esF.collect().toSet == es.collect().toSet)
    assert(tsF.collect().toSet == ts.collect().toSet)
    docs.unpersist()
  }

  test("pair+rank key combiner: dense bitset path == hash-map path") {
    // the analytics dict (22 terms) takes the dense path; denseMax = 0
    // forces the open-dictionary hash fallback on the same input — the
    // distinct key sets must agree exactly (self keys AND capped pairs)
    val docs = Corpus.synthesize(spark, 300, AnalyticsDomain.vocab).persist()
    val pipe = graft.KgPipeline.analytics(spark)
    val ms = pipe.mentionSets(docs).persist()
    val pm = ms.select(org.apache.spark.sql.functions.col("pm")).as[Array[Long]]
    for (cap <- Seq(3, graft.extract.Mentions.DefaultMaxEntitiesPerDoc)) {
      val dense = graft.extract.CoocCombine
        .partialPairAndRankKeys(pm, pipe.bcDict, cap).collect().toSet
      val hash = graft.extract.CoocCombine
        .partialPairAndRankKeys(pm, pipe.bcDict, cap, denseMax = 0).collect().toSet
      assert(dense == hash, s"cap=$cap dense=${dense.size} hash=${hash.size}")
      assert(dense.exists(k => (k >>> 32) == (k & 0xffffffffL)), "self keys present")
      assert(dense.exists(k => (k >>> 32) != (k & 0xffffffffL)), "pair keys present")
      // counts combiner: dense long[] path == hash path after the
      // downstream partial-sum (partials may differ in grouping, totals
      // must not)
      def totals(denseMax: Int) = graft.extract.CoocCombine
        .partialPairCounts(pm, pipe.bcDict, cap, denseMax = denseMax)
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _).collect().toMap
      assert(totals(graft.extract.CoocCombine.DenseMaxDictCounts) == totals(0),
        s"cap=$cap count totals diverge")
    }
    ms.unpersist(); docs.unpersist()
  }

  test("triplesFromSets == triples(nodes, edges) under a tight per-doc entity cap") {
    // the shared-scan combiner must replicate BOTH families exactly: rank
    // presence UNCAPPED (node/type parity) while pair emission honors the
    // per-doc cap (edge parity) — a cap of 3 forces the capped branch on
    // most docs, which the default-cap end-to-end tests never exercise
    val docs = Corpus.synthesize(spark, 300, AnalyticsDomain.vocab).persist()
    val pipe = graft.KgPipeline.analytics(spark)
    val ms = pipe.mentionSets(docs).persist()
    val ns = pipe.nodesFromSets(ms)
    val es = pipe.mentionEdgesFromSets(ms)
      .union(pipe.cooccurrenceEdgesFromSets(ms, maxEntitiesPerDoc = 3))
    val want = pipe.triples(ns, es).collect().toSet
    val got = pipe.triplesFromSets(ms, maxEntitiesPerDoc = 3).collect().toSet
    assert(got == want)
    ms.unpersist(); docs.unpersist()
  }

  test("triplesFromSets: reliable (checkpoint-dir) barrier == local barrier (VERDICT r7 #1)") {
    // the fused path's pushdown barrier is config-gated: with a checkpoint
    // dir set it becomes a cluster-durable Dataset.checkpoint instead of
    // localCheckpoint. Both branches must produce the identical triple set.
    val docs = Corpus.synthesize(spark, 200, AnalyticsDomain.vocab).persist()
    val pipe = graft.KgPipeline.analytics(spark)
    val ms = pipe.mentionSets(docs).persist()
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "test JVM must start without a checkpoint dir (local branch is the default)")
    val local = pipe.triplesFromSets(ms).collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val reliable = pipe.triplesFromSets(ms).collect().toSet
      assert(reliable == local, "reliable-barrier triples diverge from local-barrier triples")
      // checkpoint files actually landed on the (test-local) "cluster" FS
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable branch wrote no checkpoint files")
      // the opt-out conf forces the local branch back even with a dir set
      spark.conf.set("spark.graft.barrier", "local")
      assert(pipe.triplesFromSets(ms).collect().toSet == local)
    } finally {
      // the dir cannot be unset on a live context: leave the force-local
      // conf in place so later tests keep exercising the default branch
      spark.conf.set("spark.graft.barrier", "local")
      ms.unpersist(); docs.unpersist()
    }
  }

  test("hub-entity skewed corpus: fused == string pipeline, head term in ~half of docs (VERDICT r5 #3)") {
    // geometric hub skew: dictionary term k prepended with P = 2^-(k+1), so
    // the head entity lands in ~50% of ALL documents — the worst-case
    // open-dictionary hub shape the per-doc pair cap + packed combiner must
    // absorb without a straggling reduce key.
    val hubs = AnalyticsDomain.dictionary.map(_._1)
    val docs = Corpus.synthesizeSkewed(spark, 1200, AnalyticsDomain.vocab, hubs).persist()
    val head = hubs.head
    def headCount(ds: org.apache.spark.sql.Dataset[graft.model.Doc]): Long =
      ds.filter(d => d.spans.exists(s => s.kind == "text" && s.text != null
        && (" " + s.text + " ").contains(" " + head + " "))).count()
    val headDocs = headCount(docs)
    val baseDocs = headCount(Corpus.synthesize(spark, 1200, AnalyticsDomain.vocab))
    // injection strictly increases hub density, and the result is the
    // hub-entity extreme: head term in well over half of ALL documents
    assert(headDocs > baseDocs, s"injection no-op: $headDocs vs base $baseDocs")
    assert(headDocs >= 600, s"head hub in $headDocs/1200 docs, expected majority")
    val pipe = graft.KgPipeline.analytics(spark)
    val (ns, es, ts) = pipe.run(docs)
    val (nsF, esF, tsF) = pipe.runFused(docs)
    assert(nsF.collect().toSet == ns.collect().toSet)
    assert(esF.collect().toSet == es.collect().toSet)
    assert(tsF.collect().toSet == ts.collect().toSet)
    docs.unpersist()
  }

  test("ExtractMentions expression == string walk (ASCII byte path + non-ASCII fallbacks)") {
    import graft.model.{Doc, Span}
    import org.apache.spark.sql.GraftColumnBridge
    val docs = Seq(
      Doc("d1", Seq(Span("text", "scan join scan", null, 0))),
      // non-ASCII TEXT with an ASCII dict: the span-level String fallback
      Doc("d2", Seq(Span("text", "naïve scan—join héllo scan", null, 0),
        Span("img", null, "m1", 1))),
      Doc("d3", Seq(Span("text", "héllo join héllo", null, 0))),
      Doc("d4", Seq(Span("img", null, "m2", 0))), // no text at all
    ).toDS()
    // case A: ASCII dictionary (dense byte walk on ASCII spans);
    // case B: non-ASCII dictionary (sparse automaton, String walk always)
    val dicts = Seq(
      MentionDict.build(Seq(DictEntry("scan", "C:1", "c", 1.0), DictEntry("join", "C:2", "c", 0.5))),
      MentionDict.build(Seq(DictEntry("héllo", "C:9", "c", 1.0), DictEntry("scan", "C:1", "c", 1.0))),
    )
    for (dict <- dicts) {
      val bc = spark.sparkContext.broadcast(dict)
      val got = docs.toDF().select(col("doc_id"),
          GraftColumnBridge.column(graft.functions.ExtractMentions(
            GraftColumnBridge.expression(col("spans")), bc)).as("pm"))
        .select(col("doc_id"), explode(col("pm")).as("p"))
        .select(col("doc_id"), shiftright(col("p"), 32).cast("int"),
          col("p").bitwiseAND(lit(0xffffffffL)))
        .as[(String, Int, Long)].collect().toSet
      val expected = Mentions.detectPerDocCompact(docs, bc).collect()
        .map(m => (m.doc_id, m.rank, m.n)).toSet
      assert(got == expected, s"dict=${dict.linkFor.map(_.surface).mkString(",")}")
    }
  }

  test("countWholeWords == findWholeWords drain (dense ASCII and sparse non-ASCII)") {
    val cases = Seq(
      Seq("scan", "join", "scan join") -> Seq(
        "scan join rescan scanjoin scan", "scan", "", "join scan join"),
      Seq("he", "she", "his", "hers") -> Seq("he said she sells his hers", "ushers"),
      // non-ASCII patterns exercise the sparse fallback automaton
      Seq("héllo", "wörld") -> Seq("héllo wörld héllo", "xhéllo héllo!", "héllowörld"),
    )
    for ((pats, texts) <- cases; t <- texts) {
      val ac = AhoCorasick.build(pats)
      val expected = ac.findWholeWords(t).toList.map(_._2)
        .groupBy(identity).map { case (p, os) => p -> os.size.toLong }
      val counts = new Array[Long](pats.length)
      val touched = new Array[Int](pats.length)
      val n = ac.countWholeWords(t, counts, touched, 0)
      val got = (0 until n).map(i => touched(i) -> counts(touched(i))).toMap
      assert(got == expected, s"pats=$pats text='$t'")
    }
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

  test("contiguity guard: a shuffled DocMention dataset raises, contiguous passes") {
    import graft.extract.DocMention
    val contiguous = Seq(
      DocMention("d1", "a", "c", "a", 1, 1.0), DocMention("d1", "b", "c", "b", 1, 1.0),
      DocMention("d2", "a", "c", "a", 1, 1.0), DocMention("d2", "c", "c", "c", 1, 1.0),
    )
    val okDs = spark.createDataset(contiguous).coalesce(1)
    assert(Mentions.cooccurrencePairsFromDocMentions(okDs).count() == 2)
    assert(Mentions.distinctDocIds(okDs).count() == 2)
    // interleaved runs: d1 reappears after its run ended
    val shuffled = Seq(contiguous(0), contiguous(2), contiguous(1), contiguous(3))
    val badDs = spark.createDataset(shuffled).coalesce(1)
    def mentionsContiguity(t: Throwable): Boolean =
      t != null && (String.valueOf(t.getMessage).contains("contiguity") ||
        mentionsContiguity(t.getCause))
    val e1 = intercept[Exception] {
      Mentions.cooccurrencePairsFromDocMentions(badDs).count()
    }
    assert(mentionsContiguity(e1))
    val e2 = intercept[Exception] { Mentions.distinctDocIds(badDs).count() }
    assert(mentionsContiguity(e2))
    // opt-out keeps the old caller-asserted behavior (4 runs -> 4 emissions)
    assert(Mentions.distinctDocIds(badDs, guard = false).count() == 4)
  }

  test("per-doc pair cap bounds co-occurrence emission on an entity-list doc") {
    import graft.model.{Doc, Span}
    // 1000-term dictionary, one doc mentioning every term: uncapped emission
    // would be C(1000,2) = 499500 pairs; the cap keeps the top-256 entities
    val entries = (0 until 1000).map(i =>
      DictEntry(f"term$i%04d", f"e:$i%04d", "workload", prior = 1.0))
    val dict = MentionDict.build(entries)
    val bc = spark.sparkContext.broadcast(dict)
    val text = (0 until 1000).map(i => f"term$i%04d").mkString(" ")
    val docs = Seq(Doc("big", Seq(Span("text", text, null, 0)))).toDS()
    val capped = Mentions.cooccurrencePairs(docs, bc)
    assert(capped.count() == 256L * 255 / 2)
    // equal scores -> deterministic tie-break keeps the lexicographically
    // smallest curies (rank order)
    val srcs = capped.select("src").distinct().as[String].collect()
    assert(srcs.forall(_ <= "e:0255"))
    val dm = Mentions.detectPerDoc(docs, bc).coalesce(1)
    assert(Mentions.cooccurrencePairsFromDocMentions(dm).count() == 256L * 255 / 2)
    // demo-sized docs are untouched by the cap
    val small = Seq(Doc("s", Seq(Span("text", "term0001 term0002 term0003", null, 0)))).toDS()
    assert(Mentions.cooccurrencePairs(small, bc).count() == 3)
    // the fused CoocPackedPairs expression applies the identical cap +
    // tie-break: same pair count, same lexicographically-smallest survivors
    import org.apache.spark.sql.GraftColumnBridge
    val pmDf = docs.toDF().select(
      GraftColumnBridge.column(graft.functions.ExtractMentions(
        GraftColumnBridge.expression(col("spans")), bc)).as("pm"))
    val fusedPairs = pmDf.select(explode(GraftColumnBridge.column(
      graft.functions.CoocPackedPairs(GraftColumnBridge.expression(col("pm")),
        bc, Mentions.DefaultMaxEntitiesPerDoc))).as("pair"))
    assert(fusedPairs.count() == 256L * 255 / 2)
    val maxSrcRank = fusedPairs.select(shiftright(col("pair"), 32).cast("int"))
      .as[Int].collect().max
    assert(dict.byRank(maxSrcRank).curie <= "e:0255")
  }

  test("fused mention-set consumers tolerate arbitrary repartition (no contiguity contract)") {
    val docs = Corpus.synthesize(spark, 300, AnalyticsDomain.vocab)
    val pipe = graft.KgPipeline.analytics(spark)
    val ms = pipe.mentionSets(docs)
    val shuffled = ms.repartition(7)
    assert(pipe.cooccurrenceEdgesFromSets(shuffled).collect().toSet ==
      pipe.cooccurrenceEdgesFromSets(ms).collect().toSet)
    assert(pipe.nodesFromSets(shuffled).collect().toSet ==
      pipe.nodesFromSets(ms).collect().toSet)
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
