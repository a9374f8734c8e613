package graft

import org.scalacheck.{Gen, Properties, Test => ScTest}
import org.scalacheck.Prop.forAll
import graft.corpus.AnalyticsDomain
import graft.extract.{AhoCorasick, Mentions}
import graft.model.{Doc, Span}

/** Generator-driven span-sequence invariants (SURVEY §5, VERDICT r5 #5):
  * arbitrary interleaved text/media span mixes — unicode included — through
  * the extraction and pipeline paths. Two suites: [[TrieProps]] is pure
  * driver-side (default 100 cases), [[SpanPipelineProps]] runs Spark jobs
  * per case (fewer cases, same shared session as the scalatest suites).
  */
object PropGen {

  val dictTerm: Gen[String] = Gen.oneOf(AnalyticsDomain.dictionary.map(_._1))
  // fillers chosen to be adversarial for whole-word matching: dictionary
  // terms as substrings (rescan/joinx) and non-ASCII words that force the
  // sparse/String fallbacks
  val fillerAscii: Gen[String] =
    Gen.oneOf("a", "the", "big", "data", "rescan", "joinx", "scanjoin", "x")
  val fillerUnicode: Gen[String] =
    Gen.oneOf("héllo", "wörld", "データ", "αβγδ", "émigré", "ñandú")
  val word: Gen[String] =
    Gen.frequency(4 -> dictTerm, 2 -> fillerAscii, 1 -> fillerUnicode)
  val sentence: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private val textSpan: Gen[(String, String, String)] =
    sentence.map(t => ("text", t, null: String))
  private val mediaSpan: Gen[(String, String, String)] =
    for {
      kind <- Gen.oneOf("image", "audio", "video")
      ref <- Gen.chooseNum(0, 9999)
    } yield (kind, null: String, s"media://$kind/$ref")

  private val docSpans: Gen[List[(String, String, String)]] =
    Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(3 -> textSpan, 1 -> mediaSpan)))

  /** Corpus with distinct doc ids and ordered span offsets. */
  val corpus: Gen[List[Doc]] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, docSpans)).map { ds =>
      ds.zipWithIndex.map { case (spans, i) =>
        Doc(f"doc$i%05d",
          spans.zipWithIndex.map { case ((k, t, m), off) => Span(k, t, m, off) })
      }
    }
}

object TrieProps extends Properties("Trie") {

  private val patterns: Gen[List[String]] =
    Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, PropGen.word))
      .map(_.distinct.filter(_.nonEmpty))
      .suchThat(_.nonEmpty)

  property("countWholeWords == findWholeWords drain, any dictionary x any text") =
    forAll(patterns, PropGen.sentence) { (pats, text) =>
      val ac = AhoCorasick.build(pats)
      val expected = ac.findWholeWords(text).toList.map(_._2)
        .groupBy(identity).map { case (p, os) => p -> os.size.toLong }
      val counts = new Array[Long](pats.length)
      val touched = new Array[Int](pats.length)
      val n = ac.countWholeWords(text, counts, touched, 0)
      val got = (0 until n).map(i => touched(i) -> counts(touched(i))).toMap
      got == expected
    }

  property("findAll positions: every reported match is literally present") =
    forAll(patterns, PropGen.sentence) { (pats, text) =>
      val ac = AhoCorasick.build(pats)
      ac.findAll(text).forall { case (start, p) =>
        text.regionMatches(start, ac.patterns(p), 0, ac.patterns(p).length)
      }
    }
}

object SpanPipelineProps extends Properties("SpanPipeline") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  property("string == compact == fused pipeline on arbitrary corpora") =
    forAll(PropGen.corpus) { docs =>
      import spark.implicits._
      val ds = spark.createDataset(docs)
      val pipe = KgPipeline.analytics(spark)
      val (ns, es, ts) = pipe.run(ds)
      val (nsC, esC, tsC) = pipe.runCompact(ds)
      val (nsF, esF, tsF) = pipe.runFused(ds)
      val ok = nsC.collect().toSet == ns.collect().toSet &&
        esC.collect().toSet == es.collect().toSet &&
        tsC.collect().toSet == ts.collect().toSet &&
        nsF.collect().toSet == ns.collect().toSet &&
        esF.collect().toSet == es.collect().toSet &&
        tsF.collect().toSet == ts.collect().toSet
      spark.catalog.clearCache() // the three runs persist their working sets
      ok
    }

  property("detectPerDoc == detect aggregated; compact decodes to the same rows") =
    forAll(PropGen.corpus) { docs =>
      import spark.implicits._
      val ds = spark.createDataset(docs)
      val bc = spark.sparkContext.broadcast(AnalyticsDomain.dict)
      val occ = Mentions.detect(ds, bc).collect().filter(_.cls != "media")
        .groupBy(m => (m.doc_id, m.curie)).map { case (k, ms) => k -> ms.length.toLong }
      val perDoc = Mentions.detectPerDoc(ds, bc).collect()
        .map(m => (m.doc_id, m.curie) -> m.n).toMap
      val dict = AnalyticsDomain.dict
      val compact = Mentions.detectPerDocCompact(ds, bc).collect()
        .map(m => (m.doc_id, dict.byRank(m.rank).curie) -> m.n).toMap
      occ == perDoc && perDoc == compact
    }

  property("media spans pass through detect as provenance mentions, counts exact") =
    forAll(PropGen.corpus) { docs =>
      import spark.implicits._
      val ds = spark.createDataset(docs)
      val bc = spark.sparkContext.broadcast(AnalyticsDomain.dict)
      val media = Mentions.detect(ds, bc).collect().filter(_.cls == "media")
      val expected = docs.flatMap(d =>
        d.spans.filter(s => s.kind != "text" && s.media_ref != null)
          .map(s => (d.doc_id, s.media_ref, s.offset)))
      media.map(m => (m.doc_id, m.curie, m.span_offset)).sorted.toSeq ==
        expected.map { case (d, r, o) => (d, r, o) }.sorted
    }

  property("span signature: identity-stable, mutation-sensitive") =
    forAll(PropGen.corpus) { docs =>
      import spark.implicits._
      val df = spark.createDataset(docs).toDF()
      val same = Mentions.invariantViolations(df, df) == 0
      // bump the last span's offset of every non-empty doc: the rendered
      // (kind, text, media_ref, offset) sequence changes, so every such
      // doc must violate
      val mutated = docs.map { d =>
        if (d.spans.isEmpty) d
        else d.copy(spans = d.spans.init :+ d.spans.last.copy(offset = d.spans.last.offset + 1))
      }
      val nMutable = docs.count(_.spans.nonEmpty)
      val viol = Mentions.invariantViolations(df, spark.createDataset(mutated).toDF())
      same && viol == nMutable
    }
}

/** Generator-driven invariants of the distributed prefix-sum packing
  * ([[graft.ops.SampleOps.packSequences]]): stream conservation and
  * partition-count independence over arbitrary corpora and capacities. */
object PackProps extends Properties("PackSequences") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkTestBase.spark

  private val corpusAndCapacity: Gen[(List[(Long, String)], Long, Int)] =
    for {
      n <- Gen.chooseNum(1, 40)
      lens <- Gen.listOfN(n, Gen.chooseNum(1, 20))
      capacity <- Gen.chooseNum(1L, 64L)
      parts <- Gen.chooseNum(2, 9)
    } yield (lens.zipWithIndex.map { case (l, i) =>
      (i.toLong, List.fill(l)("w").mkString(" "))
    }, capacity, parts)

  property("stream conservation + partition independence, arbitrary corpora") =
    forAll(corpusAndCapacity) { case (docs, capacity, parts) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val rows = graft.ops.SampleOps.packSequences(df, capacity, numPartitions = parts)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long)].collect().toList
      // conservation: offsets are the running total of token counts in id
      // order, starting at zero
      val offsetsOk = rows.scanLeft(0L) { case (acc, (_, n, _, _, _)) => acc + n }
        .zip(rows).forall { case (expStart, (_, _, start, _, _)) => expStart == start }
      // chunk math: seq_id and spanned-count follow the capacity grid
      val gridOk = rows.forall { case (_, n, s, seqId, nSeqs) =>
        seqId == s / capacity && nSeqs == (s + n - 1) / capacity - s / capacity + 1
      }
      // partition independence: any partition count == the 1-partition run
      val one = graft.ops.SampleOps.packSequences(df, capacity, numPartitions = 1)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      offsetsOk && gridOk && rows.toSet == one
    }

  property("slice view: per-doc slices sum to n_tokens, every seq full except the last") =
    forAll(corpusAndCapacity) { case (docs, capacity, parts) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val slices = graft.ops.SampleOps.packSlices(df, capacity, numPartitions = parts)
        .as[(Long, Long, Long, Long)].collect().toList
      val nTok = docs.map { case (id, t) => id -> t.split(" ").length.toLong }.toMap
      // conservation: each doc's slice lengths sum to its token count, and
      // skip offsets tile the doc contiguously from 0 in seq order
      val perDoc = slices.groupBy(_._2).map { case (d, ss) =>
        val sorted = ss.sortBy(_._1)
        val tiled = sorted.scanLeft(0L)(_ + _._4).zip(sorted)
          .forall { case (skip, (_, _, sk, _)) => skip == sk }
        sorted.map(_._4).sum == nTok(d) && tiled && ss.forall(_._4 > 0)
      }
      // capacity: every sequence except the highest-numbered holds exactly
      // `capacity` tokens
      val bySeq = slices.groupBy(_._1)
      val lastSeq = bySeq.keys.max
      val fullOk = bySeq.forall { case (q, ss) =>
        val tot = ss.map(_._4).sum
        if (q == lastSeq) tot <= capacity && tot > 0 else tot == capacity
      }
      perDoc.forall(identity) && fullOk
    }
}

/** Generator-driven invariants of the intra-corpus self-dedup family
  * ([[graft.ops.DedupOps.selfNgramDedup]]/`selfNgramSpans`/`applySelfNgram`):
  * all three views must agree with a driver-side ground truth computed
  * with the SAME md5-derived gram hash (so string-collision noise cannot
  * flake the comparison) over arbitrary corpora and window widths. */
object SelfGramProps extends Properties("SelfNgramDedup") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkTestBase.spark

  /** Driver-side replica of TextOps.tokenHash mod Mod. */
  private def hash56(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(14)
    java.lang.Long.parseLong(hex, 16) % graft.ops.TextOps.Mod
  }

  /** Positional grams per the shared convention: a doc shorter than n
    * tokens contributes its whole text as one gram at position 1. */
  private def posGrams(text: String, n: Int): Seq[(Int, String)] = {
    val t = text.split(" ", -1).toSeq
    if (t.length >= n) t.sliding(n).map(_.mkString(" ")).zipWithIndex
      .map { case (g, i) => (i + 1, g) }.toSeq
    else Seq((1, t.mkString(" ")))
  }

  // small vocabulary so cross-doc shared windows actually occur
  private val corpusGen: Gen[(List[(Long, String)], Int)] = for {
    nDocs <- Gen.chooseNum(2, 24)
    width <- Gen.chooseNum(2, 4)
    texts <- Gen.listOfN(nDocs,
      Gen.chooseNum(1, 12).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))))
  } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, width)

  property("doc view, span view and apply agree with the driver-side truth") =
    forAll(corpusGen) { case (docs, n) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      // ground truth on hashed grams
      val byDoc = docs.map { case (id, t) =>
        id -> posGrams(t, n).map { case (p, g) => (p, hash56(g)) }
      }.toMap
      val dfCount = byDoc.values.flatMap(_.map(_._2).distinct).toSeq
        .groupBy(identity).map { case (h, xs) => h -> xs.size.toLong }
      val wantDoc = byDoc.map { case (id, gs) =>
        val distinct = gs.map(_._2).distinct
        val shared = distinct.count(h => dfCount(h) >= 2L)
        (id, distinct.size.toLong, shared.toLong,
          BigDecimal(shared.toDouble / distinct.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
      val gotDoc = graft.ops.DedupOps.selfNgramDedup(df, n)
        .as[(Long, Long, Long, Double)].collect().toSet
      val wantSpans = byDoc.flatMap { case (id, gs) =>
        gs.collect { case (p, h) if dfCount(h) >= 2L => (id, p.toLong, h, dfCount(h)) }
      }.toSet
      val gotSpans = graft.ops.DedupOps.selfNgramSpans(df, n)
        .as[(Long, Long, Long, Long)].collect().toSet
      val wantKept = wantDoc.collect {
        case (id, ng, ns, _) if ns.toDouble < ng.toDouble * 0.5 => id }
      val gotKept = graft.ops.DedupOps.applySelfNgram(df, n, maxRatio = 0.5)
        .select("doc_id").as[Long].collect().toSet
      gotDoc == wantDoc && gotSpans == wantSpans && gotKept == wantKept
    }
}
