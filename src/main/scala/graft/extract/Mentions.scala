package graft.extract

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.model.Props.Props

/** One dictionary entry: a surface form linked to a canonical entity. */
final case class DictEntry(surface: String, curie: String, cls: String, prior: Double)

/** The broadcastable entity-linking dictionary: an Aho-Corasick automaton
  * over all surface forms plus per-pattern link metadata. Ambiguous surfaces
  * (same form, several entities) are resolved by highest prior, then
  * lexicographic CURIE — deterministic by construction. */
final class MentionDict private (
    val trie: AhoCorasick,
    val linkFor: Array[DictEntry], // one winner per pattern index
) extends Serializable {
  /** pattern index -> rank in curie lexicographic order (so integer-keyed
    * hot loops can reproduce string-ordered outputs). */
  @transient lazy val rankOf: Array[Int] = {
    val order = linkFor.indices.sortBy(i => linkFor(i).curie)
    val r = new Array[Int](linkFor.length)
    order.zipWithIndex.foreach { case (pi, rank) => r(pi) = rank }
    r
  }
  /** rank -> dictionary entry (inverse of rankOf). */
  @transient lazy val byRank: Array[DictEntry] =
    linkFor.indices.sortBy(i => linkFor(i).curie).map(linkFor).toArray
  /** rank -> per-occurrence score unit (prior x surface length): a mention's
    * score is `scoreUnitByRank(rank) * n`, so the cached compact row need
    * not carry it — executor-side consumers rederive it from the broadcast
    * dictionary instead of paying 8 bytes/row of cache bandwidth. */
  @transient lazy val scoreUnitByRank: Array[Double] =
    byRank.map(e => e.prior * e.surface.length)
}

object MentionDict {
  def build(entries: Seq[DictEntry]): MentionDict = {
    val bySurface = entries.groupBy(_.surface).toSeq.sortBy(_._1)
    val winners = bySurface.map { case (_, es) =>
      es.minBy(e => (-e.prior, e.curie))
    }
    val trie = AhoCorasick.build(winners.map(_.surface))
    new MentionDict(trie, winners.toArray)
  }
}

/** A detected entity mention with provenance back to the span it came from
  * (the per-row span-sequence invariant carries kind/text/media_ref/order).
  */
final case class Mention(
    doc_id: String,
    curie: String,
    cls: String,
    surface: String,
    span_offset: Int, // ordering position of the span within the doc
    span_kind: String,
    char_start: Int,
    score: Double,
)

/** A per-document aggregated mention: one row per (doc, entity), with the
  * occurrence count — the pipeline's working row. Thin (flat strings) on
  * purpose: downstream distincts stay in codegen'd HashAggregate. */
final case class DocMention(
    doc_id: String,
    curie: String,
    cls: String,
    surface: String,
    n: Long,
    score: Double,
)

/** Dictionary-coded per-document mention: the entity is the pattern's
  * curie-lexicographic RANK (see [[MentionDict.rankOf]]), not its strings.
  * This is the SCALE-PATH working row: the corpus-sized cache, shuffles and
  * aggregations carry one int instead of three strings (curie/cls/surface),
  * and rank order == curie order, so every downstream sort/pair semantics is
  * preserved exactly. Strings re-enter via a broadcast rank join (or the
  * driver-sized [[MentionDict.byRank]] table) AFTER the big aggregations —
  * dictionary encoding end-to-end, decoded at the edges. The mention score
  * is NOT carried: it is `scoreUnitByRank(rank) * n`, rederived from the
  * broadcast dictionary by the one consumer that needs it (the co-occurrence
  * cap tie-break) instead of widening every cached row by 8 bytes. */
final case class DocMentionC(
    doc_id: String,
    rank: Int,
    n: Long,
)

/** Mention detection + entity linking over interleaved text+media documents
  * — the web-scale "adapter" stage (BASELINE.json north rule; replaces the
  * reference's user-generator source, biocypher/_core.py:421-461).
  *
  * Text spans are matched with the broadcast Aho-Corasick dictionary inside
  * `mapPartitions`; media spans pass through as `media_ref`-keyed provenance
  * mentions. No shuffle: the stage is a narrow map over the doc scan,
  * parallel in the number of input partitions.
  */
object Mentions {

  /** Default cap on distinct entities per document for co-occurrence pair
    * emission. Pair output is quadratic in per-doc entities; against an
    * open 10⁶-term dictionary a single entity-list page would otherwise
    * emit millions of pairs. 256 keeps the worst doc at ≤32,640 pairs and
    * is far above anything the demo dictionaries produce (22 terms), so
    * capped and uncapped results agree on the oracle corpora. */
  val DefaultMaxEntitiesPerDoc = 256

  /** Per-doc occurrence counts saturate at 2³¹-1: the fused packed-long path
    * ([[graft.functions.ExtractMentions]]) has only 32 bits for the count
    * half of its `(rank << 32) | n` encoding, so the string and compact
    * paths clamp at the same bound — all three pipeline paths agree by
    * construction (ADVICE r5), and a single doc would need >2 G occurrences
    * of one entity to ever reach it. */
  val MaxOccurrencesPerDoc: Long = 0x7fffffffL

  @inline private def clampN(n: Long): Long =
    if (n > MaxOccurrencesPerDoc) MaxOccurrencesPerDoc else n

  /** Minimal open-addressing set of longs (8 B per entry, power-of-two
    * table) — backs the doc-run contiguity guard at one hash probe per
    * run with no per-entry boxing. */
  private final class LongHashSet(initCap: Int) {
    private var mask = initCap - 1
    private var table = new Array[Long](initCap)
    private var used = new Array[Boolean](initCap)
    private var n = 0
    /** true iff v was newly added (false = already present). */
    def add(v: Long): Boolean = {
      var i = java.lang.Long.hashCode(v * -7046029254386353131L) & mask
      while (used(i)) {
        if (table(i) == v) return false
        i = (i + 1) & mask
      }
      table(i) = v; used(i) = true; n += 1
      if (n * 2 > mask) grow()
      true
    }
    private def grow(): Unit = {
      val (ot, ou) = (table, used)
      mask = mask * 2 + 1
      table = new Array[Long](mask + 1)
      used = new Array[Boolean](mask + 1)
      n = 0
      var i = 0
      while (i < ot.length) { if (ou(i)) add(ot(i)); i += 1 }
    }
  }

  private def docHash(id: String): Long = {
    // FNV-1a 64 — cheap, well-mixed; a collision (~n²/2⁶⁴) only makes the
    // guard raise spuriously, never pass wrongly
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < id.length) { h ^= id.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Top-`cap` entity ranks by (score desc, rank asc) — the deterministic
    * per-doc entity selection when a doc exceeds the pair-emission cap. */
  private[graft] def topRanksByScore(ranks: Array[Int], scores: Array[Double], cap: Int): Array[Int] = {
    val idx = ranks.indices.sortBy(i => (-scores(i), ranks(i))).take(cap)
    val out = idx.map(ranks).toArray
    java.util.Arrays.sort(out)
    out
  }

  def detect(docs: Dataset[Doc], bcDict: Broadcast[MentionDict]): Dataset[Mention] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Mention]
    docs.mapPartitions { it =>
      val dict = bcDict.value
      it.flatMap { doc =>
        doc.spans.iterator.flatMap { span =>
          if (span.kind == "text" && span.text != null) {
            dict.trie.findWholeWords(span.text).map { case (start, pi) =>
              val e = dict.linkFor(pi)
              // candidate score: surface-length prior x dictionary prior
              val score = e.prior * e.surface.length
              Mention(doc.doc_id, e.curie, e.cls, e.surface, span.offset, span.kind, start, score)
            }
          } else if (span.media_ref != null) {
            // media spans: opaque provenance mention keyed by media_ref
            Iterator.single(Mention(doc.doc_id, span.media_ref, "media", span.kind,
              span.offset, span.kind, -1, 0.0))
          } else Iterator.empty
        }
      }
    }
  }

  /** Occurrence mentions aggregated per document inside the same narrow
    * pass (a per-doc hash map in the flatMap — no shuffle): one row per
    * (doc, entity) with occurrence count and summed score. This is the
    * scale-path entry: downstream dedups operate on these thin rows. */
  def detectPerDoc(docs: Dataset[Doc], bcDict: Broadcast[MentionDict]): Dataset[DocMention] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[DocMention]
    docs.mapPartitions { it =>
      val dict = bcDict.value
      // integer-keyed occurrence counting, one DocMention built per distinct
      // entity (this pass is allocation-bound at 32 threads — keep it lean)
      val counts = new Array[Long](dict.linkFor.length)
      val touched = new Array[Int](dict.linkFor.length)
      it.flatMap { doc =>
        var nTouched = 0
        doc.spans.foreach { span =>
          if (span.kind == "text" && span.text != null)
            nTouched = dict.trie.countWholeWords(span.text, counts, touched, nTouched)
        }
        val out = new Array[DocMention](nTouched)
        var i = 0
        while (i < nTouched) {
          val pi = touched(i)
          val e = dict.linkFor(pi)
          val n = clampN(counts(pi))
          out(i) = DocMention(doc.doc_id, e.curie, e.cls, e.surface, n,
            e.prior * e.surface.length * n)
          counts(pi) = 0
          i += 1
        }
        out
      }
    }
  }

  /** [[detectPerDoc]]'s dictionary-coded twin: one (doc_id, rank, n) row
    * per (doc, entity). Same trie pass, same per-doc aggregation — the
    * emission carries the pattern's curie-lex rank instead of the three
    * entity strings. See [[DocMentionC]] for why this is the row the
    * 100-TB path caches and shuffles. */
  def detectPerDocCompact(docs: Dataset[Doc], bcDict: Broadcast[MentionDict]): Dataset[DocMentionC] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[DocMentionC]
    docs.mapPartitions { it =>
      val dict = bcDict.value
      val counts = new Array[Long](dict.linkFor.length)
      val touched = new Array[Int](dict.linkFor.length)
      it.flatMap { doc =>
        var nTouched = 0
        doc.spans.foreach { span =>
          if (span.kind == "text" && span.text != null)
            nTouched = dict.trie.countWholeWords(span.text, counts, touched, nTouched)
        }
        val out = new Array[DocMentionC](nTouched)
        var i = 0
        while (i < nTouched) {
          val pi = touched(i)
          out(i) = DocMentionC(doc.doc_id, dict.rankOf(pi), clampN(counts(pi)))
          counts(pi) = 0
          i += 1
        }
        out
      }
    }
  }

  /** Co-occurring entity pairs emitted per document in the same narrow
    * pass (doc-local entity set -> ordered pairs), then one tiny aggregate:
    * (src, tgt, n_docs). Replaces a 2x-sort self-join of the mention table
    * — at 1.5M docs the join took minutes, this takes seconds, and the
    * shuffle is O(distinct pairs), not O(docs x pairs). */
  def cooccurrencePairs(docs: Dataset[Doc], bcDict: Broadcast[MentionDict],
      maxEntitiesPerDoc: Int = DefaultMaxEntitiesPerDoc): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val droppedDocs = spark.sparkContext.longAccumulator("cooccurrence_capped_docs")
    val droppedEntities = spark.sparkContext.longAccumulator("cooccurrence_dropped_entities")
    val pairs = docs.mapPartitions { it =>
      val dict = bcDict.value
      val counts = new Array[Long](dict.linkFor.length)
      val touched = new Array[Int](dict.linkFor.length)
      it.flatMap { doc =>
        // distinct entity RANKS per doc (curie lexicographic order preserved
        // via integer ranks — keeps a < b semantics without string sorting)
        var nTouched = 0
        doc.spans.foreach { span =>
          if (span.kind == "text" && span.text != null)
            nTouched = dict.trie.countWholeWords(span.text, counts, touched, nTouched)
        }
        var arr = new Array[Int](nTouched)
        val scores = new Array[Double](nTouched)
        var i = 0
        while (i < nTouched) {
          val pi = touched(i)
          arr(i) = dict.rankOf(pi)
          val e = dict.linkFor(pi)
          scores(i) = e.prior * e.surface.length * clampN(counts(pi))
          counts(pi) = 0
          i += 1
        }
        // pair-emission cap: an open-dictionary entity-list page would emit
        // O(n²) pairs; keep the top-scored entities (deterministic
        // tie-break by rank) and count the drop
        if (nTouched > maxEntitiesPerDoc) {
          droppedDocs.add(1)
          droppedEntities.add(nTouched - maxEntitiesPerDoc)
          arr = topRanksByScore(arr, scores, maxEntitiesPerDoc)
        } else java.util.Arrays.sort(arr)
        for { a <- arr.indices.iterator; b <- (a + 1) until arr.length }
          yield (dict.byRank(arr(a)).curie, dict.byRank(arr(b)).curie)
      }
    }.toDF("src", "tgt")
    pairs.groupBy(col("src"), col("tgt")).agg(count(lit(1)).as("n_docs"))
  }

  /** Co-occurring entity pairs derived from an UNSHUFFLED DocMention
    * dataset (straight from [[detectPerDoc]], possibly persisted): rows of
    * one doc are contiguous within a partition by construction, so per-doc
    * entity sets rebuild in a narrow pass — no second corpus scan, no
    * re-running the trie, no shuffle before the final tiny aggregate.
    *
    * Contract: `dm` must come from [[detectPerDoc]] without an intervening
    * shuffle (the doc-run contiguity invariant). The contract is ENFORCED
    * at runtime when `guard` is on (default): each partition tracks the
    * hash of every doc-run it has closed (8 B per run) and raises if a
    * doc_id reappears after its run ended — a re-shuffled input fails
    * loudly instead of silently emitting wrong pairs. Within a doc the
    * curies are already distinct; lexicographic sort reproduces the a < b
    * pair order of [[cooccurrencePairs]] exactly, and the same
    * `maxEntitiesPerDoc` cap applies (top score, curie tie-break). */
  def cooccurrencePairsFromDocMentions(dm: Dataset[DocMention],
      maxEntitiesPerDoc: Int = DefaultMaxEntitiesPerDoc,
      guard: Boolean = true): DataFrame = {
    val spark = dm.sparkSession
    import spark.implicits._
    val droppedDocs = spark.sparkContext.longAccumulator("cooccurrence_capped_docs")
    val pairs = dm.mapPartitions { it =>
      val base = it.buffered
      val seenRuns = if (guard) new LongHashSet(1 << 16) else null
      // reusable per-partition primitive buffers: the hot loop allocates
      // NOTHING per mention row (a (String, Double) tuple here costs a
      // Tuple2 + boxed Double per row — measurable allocation pressure at
      // 32 threads on the bandwidth-bound pipeline)
      var curies = new Array[String](256)
      var scores = new Array[Double](256)
      new Iterator[(String, String)] {
        private var out: Iterator[(String, String)] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && base.hasNext) {
            val docId = base.head.doc_id
            if (guard && !seenRuns.add(docHash(docId)))
              throw new IllegalStateException(
                s"doc-run contiguity violated: doc_id $docId reappeared after its run " +
                  "ended — the DocMention dataset was shuffled between detectPerDoc " +
                  "and pair emission (pass guard=false only if contiguity is certain)")
            var n = 0
            while (base.hasNext && base.head.doc_id == docId) {
              if (n == curies.length) {
                curies = java.util.Arrays.copyOf(curies, n * 2)
                scores = java.util.Arrays.copyOf(scores, n * 2)
              }
              val m = base.next()
              curies(n) = m.curie; scores(n) = m.score; n += 1
            }
            if (n >= 2) {
              val arr: Array[String] =
                if (n > maxEntitiesPerDoc) {
                  droppedDocs.add(1)
                  val kept = (0 until n).sortBy(i => (-scores(i), curies(i)))
                    .take(maxEntitiesPerDoc).map(curies).toArray
                  java.util.Arrays.sort(kept.asInstanceOf[Array[Object]])
                  kept
                } else {
                  val a = java.util.Arrays.copyOf(curies, n)
                  java.util.Arrays.sort(a.asInstanceOf[Array[Object]])
                  a
                }
              out = for {
                a <- arr.indices.iterator
                b <- ((a + 1) until arr.length).iterator
              } yield (arr(a), arr(b))
            }
          }
        }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): (String, String) = { advance(); out.next() }
      }
    }.toDF("src", "tgt")
    pairs.groupBy(col("src"), col("tgt")).agg(count(lit(1)).as("n_docs"))
  }

  /** [[cooccurrencePairsFromDocMentions]]'s dictionary-coded twin over
    * [[DocMentionC]]: pair rows are (src_rank, tgt_rank) INTS — rank order
    * == curie order, so `src_rank < tgt_rank` reproduces the `a < b` curie
    * pair semantics (and the score/rank cap tie-break) exactly, while the
    * only corpus-sized exchange carries 8 bytes per pair instead of two
    * strings. Columns: (src_rank, tgt_rank, n_docs); decode ranks AFTER
    * this aggregate. Same doc-run contiguity contract and runtime guard. */
  def cooccurrencePairsFromCompact(dmc: Dataset[DocMentionC],
      bcDict: Broadcast[MentionDict],
      maxEntitiesPerDoc: Int = DefaultMaxEntitiesPerDoc,
      guard: Boolean = true): DataFrame = {
    val spark = dmc.sparkSession
    import spark.implicits._
    val droppedDocs = spark.sparkContext.longAccumulator("cooccurrence_capped_docs")
    // pairs are PACKED into one long (srcRank << 32 | tgtRank): the only
    // corpus-sized exchange shuffles a single 8-byte key (16 B/row unsafe
    // format vs 24 B for two int columns) and aggregates on one primitive
    val packed = dmc.mapPartitions { it =>
      // cap tie-break scores rederive from the broadcast dictionary
      // (score = scoreUnit(rank) * n) — the cached row doesn't carry them
      val su = bcDict.value.scoreUnitByRank
      val base = it.buffered
      val seenRuns = if (guard) new LongHashSet(1 << 16) else null
      var ranks = new Array[Int](256)
      var scores = new Array[Double](256)
      new Iterator[Long] {
        private var out: Iterator[Long] = Iterator.empty
        private def advance(): Unit = {
          while (!out.hasNext && base.hasNext) {
            val docId = base.head.doc_id
            if (guard && !seenRuns.add(docHash(docId)))
              throw new IllegalStateException(
                s"doc-run contiguity violated: doc_id $docId reappeared after its run " +
                  "ended — the DocMentionC dataset was shuffled between detectPerDocCompact " +
                  "and pair emission (pass guard=false only if contiguity is certain)")
            var n = 0
            while (base.hasNext && base.head.doc_id == docId) {
              if (n == ranks.length) {
                ranks = java.util.Arrays.copyOf(ranks, n * 2)
                scores = java.util.Arrays.copyOf(scores, n * 2)
              }
              val m = base.next()
              ranks(n) = m.rank; scores(n) = su(m.rank) * m.n; n += 1
            }
            if (n >= 2) {
              val arr: Array[Int] =
                if (n > maxEntitiesPerDoc) {
                  droppedDocs.add(1)
                  topRanksByScore(java.util.Arrays.copyOf(ranks, n),
                    java.util.Arrays.copyOf(scores, n), maxEntitiesPerDoc)
                } else {
                  val a = java.util.Arrays.copyOf(ranks, n)
                  java.util.Arrays.sort(a)
                  a
                }
              out = for {
                a <- arr.indices.iterator
                b <- ((a + 1) until arr.length).iterator
              } yield (arr(a).toLong << 32) | arr(b).toLong
            }
          }
        }
        def hasNext: Boolean = { advance(); out.hasNext }
        def next(): Long = { advance(); out.next() }
      }
    }(org.apache.spark.sql.Encoders.scalaLong).toDF("pair")
    packed.groupBy(col("pair")).agg(count(lit(1)).as("n_docs"))
      .select(
        shiftright(col("pair"), 32).cast("int").as("src_rank"),
        col("pair").bitwiseAND(lit(0xffffffffL)).cast("int").as("tgt_rank"),
        col("n_docs"))
  }

  /** Distinct doc ids from an UNSHUFFLED DocMention dataset (same
    * contiguity contract — and runtime guard — as
    * [[cooccurrencePairsFromDocMentions]]): each doc is one contiguous run
    * in exactly one partition, so emitting one id per run IS the global
    * distinct — no 10⁶-key shuffle. */
  def distinctDocIds(dm: Dataset[DocMention], guard: Boolean = true): Dataset[String] =
    distinctRunIds(dm.sparkSession, dm.map(_.doc_id)(org.apache.spark.sql.Encoders.STRING), guard)

  /** [[distinctDocIds]] over the dictionary-coded rows — same contract. */
  def distinctDocIdsC(dmc: Dataset[DocMentionC], guard: Boolean = true): Dataset[String] =
    distinctRunIds(dmc.sparkSession, dmc.map(_.doc_id)(org.apache.spark.sql.Encoders.STRING), guard)

  private def distinctRunIds(spark: SparkSession, ids: Dataset[String],
      guard: Boolean): Dataset[String] = {
    import spark.implicits._
    ids.mapPartitions { it =>
      val seenRuns = if (guard) new LongHashSet(1 << 16) else null
      var last: String = null
      it.flatMap { id =>
        if (id == last) Iterator.empty
        else {
          if (guard && !seenRuns.add(docHash(id)))
            throw new IllegalStateException(
              s"doc-run contiguity violated: doc_id $id reappeared after its " +
                "run ended — the mention dataset was shuffled after extraction")
          last = id
          Iterator.single(id)
        }
      }
    }
  }

  /** Entity AND document nodes from text mentions, one narrow pass: per
    * occurrence, the CURIE entity node plus its document's node (the
    * streaming twin of the batch path's entity-distinct + doc-distinct —
    * downstream cross-batch dedup collapses the repeats). */
  def toRawNodesWithDocs(mentions: Dataset[Mention]): Dataset[RawNode] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[RawNode]
    mentions.filter(_.cls != "media").flatMap { m =>
      Seq(
        RawNode(m.curie, m.cls, Props.of("name" -> PV.str(m.surface))),
        RawNode(m.doc_id, "document", Props.empty))
    }
  }

  /** Entity nodes from text mentions: canonical id = CURIE; the surface and
    * detection stats become properties downstream of dedup. */
  def toRawNodes(mentions: Dataset[Mention]): Dataset[RawNode] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[RawNode]
    mentions.filter(_.cls != "media").map { m =>
      RawNode(m.curie, m.cls, Props.of("name" -> PV.str(m.surface)))
    }
  }

  /** Document->entity mention edges. */
  def toMentionEdges(mentions: Dataset[Mention], inputLabel: String = "mentions"): Dataset[RawEdge] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[RawEdge]
    mentions.filter(_.cls != "media").map { m =>
      RawEdge(null, m.doc_id, m.curie, inputLabel, Props.empty)
    }
  }

  /** Distinct co-occurring entity pairs per doc (a < b), with pair counts —
    * pure Catalyst (exploded self-join per doc on the deduped per-doc entity
    * list, no UDF). */
  def cooccurrence(mentions: Dataset[Mention]): DataFrame = {
    val perDoc = mentions.filter(col("cls") =!= "media")
      .select(col("doc_id"), col("curie")).distinct()
    val a = perDoc.as("a"); val b = perDoc.as("b")
    a.join(b, col("a.doc_id") === col("b.doc_id") && col("a.curie") < col("b.curie"))
      .groupBy(col("a.curie").as("src"), col("b.curie").as("tgt"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Span-sequence signature per doc: md5 over the ordered
    * (kind, text, media_ref, offset) tuples — the per-row invariant column
    * (BASELINE.json input_hint). Pure Catalyst expression. */
  def spanSignature(spansCol: Column): Column = {
    val rendered = transform(spansCol, s =>
      concat_ws("",
        coalesce(s.getField("kind"), lit(" ")),
        coalesce(s.getField("text"), lit(" ")),
        coalesce(s.getField("media_ref"), lit(" ")),
        s.getField("offset").cast("string")))
    md5(to_binary(array_join(rendered, ""), lit("utf-8")))
  }

  /** Assert the invariant holds between two doc tables (same doc_ids, same
    * span sequences); returns the count of violating rows. */
  def invariantViolations(before: DataFrame, after: DataFrame): Long = {
    val b = before.select(col("doc_id"), spanSignature(col("spans")).as("sig_b"))
    val a = after.select(col("doc_id"), spanSignature(col("spans")).as("sig_a"))
    b.join(a, Seq("doc_id"), "full_outer")
      .filter(col("sig_b").isNull || col("sig_a").isNull || col("sig_b") =!= col("sig_a"))
      .count()
  }
}
