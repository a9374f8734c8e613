package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.AnalyticsDomain
import graft.dedup.Dedup
import graft.extract.{DocMention, DocMentionC, Mention, MentionDict, Mentions}
import graft.model._
import graft.model.Props.Props
import graft.translate.Translate

/** End-to-end KG construction over an interleaved document corpus
  * (the north-star pipeline): docs -> mention detection + entity linking
  * (broadcast Aho-Corasick, aggregated per doc in the same narrow pass) ->
  * schema/ontology translation -> dedup -> triples + node/edge tables.
  *
  * Scale discipline:
  *  - mention detection emits ONE thin row per (doc, entity) — per-doc
  *    aggregation happens inside the flatMap, no shuffle;
  *  - every distinct/dedup runs over FLAT string/long columns with
  *    map-side partial aggregation (fat rows with array<struct> props
  *    would force ObjectHashAggregate's sort-based fallback — measured
  *    15x slower at 300k docs); the one struct-min winner pass in the
  *    string path is a SortAggregate by HashAggregateExec's buffer rules
  *    (see [[nodes]]) — the scale paths aggregate ints only;
  *  - property bags are attached AFTER the shuffles, in narrow maps;
  *  - the dictionary/ontology side is broadcast, never shuffled.
  * Total exchanges per run: doc-distinct, entity-distinct, co-occurrence
  * join+aggregate — all over thin rows.
  */
final class KgPipeline(
    spark: SparkSession,
    ctx: KgContext,
    dict: MentionDict,
) extends Serializable {

  @transient private[graft] val ctxRef = ctx
  val bcCtx = spark.sparkContext.broadcast(ctx)
  val bcDict = spark.sparkContext.broadcast(dict)

  import spark.implicits._

  /** Occurrence-level mentions (provenance API; tests, audits). */
  def mentions(docs: Dataset[Doc]): Dataset[Mention] = Mentions.detect(docs, bcDict)

  /** Per-(doc, entity) mentions — the pipeline's working set. */
  def docMentions(docs: Dataset[Doc]): Dataset[DocMention] =
    Mentions.detectPerDoc(docs, bcDict)

  /** Dictionary-coded working set (the scale path): one int rank instead of
    * three entity strings per row — see [[DocMentionC]]. */
  def docMentionsCompact(docs: Dataset[Doc]): Dataset[DocMentionC] =
    Mentions.detectPerDocCompact(docs, bcDict)

  /** Driver-sized (rank, curie) decode table for post-aggregation broadcast
    * joins — the dictionary-decoding edge of the compact path. */
  @transient private lazy val rankCurie: DataFrame = {
    import spark.implicits._
    spark.createDataset(
      bcDict.value.byRank.toSeq.zipWithIndex.map { case (e, r) => (r, e.curie) }
    ).toDF("rank", "curie")
  }

  /** Entity + document nodes, translated and globally deduped. The big
    * distincts run on thin string columns; fat property rows are built
    * only for the (small) distinct survivors. */
  def nodes(dm: Dataset[DocMention]): Dataset[KgNode] = {
    // ONE node per curie even when several surface aliases link to the same
    // entity (reference global id uniqueness, _deduplicate.py:44-51): a
    // deterministic (cls, surface) winner per curie: min(struct) with
    // map-side partial aggregation in one shuffle. NOTE this pass is a
    // SortAggregate, not HashAggregate: a struct (or string) min needs a
    // variable-width aggregation buffer, which HashAggregateExec does not
    // support, and the hash-friendly rewrite (distinct() on the three
    // columns first, then min(struct) over the dictionary-bounded
    // survivors) is merged straight back by RemoveRedundantAggregates
    // (min is duplicate-insensitive, so Catalyst deletes the inner
    // distinct). Accepted: this is the reference-parity path; the scale
    // path (nodesFromSets/nodesFromRanks) never aggregates structs over
    // corpus-sized input - its big pass is a dictionary-bounded rank-set
    // combiner.
    val entityThin = dm.groupBy(col("curie"))
      .agg(min(struct(col("cls"), col("surface"))).as("cs"))
      .select(col("curie"), col("cs.cls").as("cls"), col("cs.surface").as("surface"))
    nodesFrom(entityThin, Mentions.distinctDocIds(dm))
  }

  /** [[nodes]] over the dictionary-coded working set: the corpus-sized
    * distinct runs on ONE int column (map-side partial HashAggregate over
    * 4-byte keys); the string entity triple is decoded from the broadcast
    * dictionary only for the tiny distinct survivors. */
  def nodesCompact(dmc: Dataset[DocMentionC]): Dataset[KgNode] =
    nodesFromRanks(dmc.select(col("rank")), Mentions.distinctDocIdsC(dmc))

  /** Shared tail of the rank-coded node paths: `ranks` is a one-int-column
    * corpus-sized frame (possibly with duplicates), `docIds` already
    * distinct. */
  private def nodesFromRanks(ranks: DataFrame, docIds: Dataset[String]): Dataset[KgNode] =
    nodesFrom(entityThinFromRanks(ranks), docIds)

  /** Dictionary-bounded (curie, cls, surface) winners for a one-int-column
    * `rank` frame (duplicates allowed): decode via the broadcast dictionary,
    * then the same deterministic min(cls, surface) winner per curie as the
    * string path — shared by the rank-coded node paths and the fused
    * triples path. */
  private def entityThinFromRanks(ranks: DataFrame): DataFrame = {
    val bd = bcDict
    ranks.distinct()
      .as[Int]
      .map { r => val e = bd.value.byRank(r); (e.curie, e.cls, e.surface) }
      .toDF("curie", "cls", "surface")
      // several surfaces (ranks) can share a curie: same min(cls, surface)
      // winner as the string path, computed over dictionary-sized rows
      .groupBy(col("curie"))
      .agg(min(struct(col("cls"), col("surface"))).as("cs"))
      .select(col("curie"), col("cs.cls").as("cls"), col("cs.surface").as("surface"))
  }

  private def nodesFrom(entityThin: DataFrame, docIds: Dataset[String]): Dataset[KgNode] = {
    val entityRaw = entityThin
      .as[(String, String, String)]
      .map { case (curie, cls, surface) =>
        RawNode(curie, cls, Props.of("name" -> PV.str(surface)))
      }
    // global cross-label id dedup (reference semantics): both branches are
    // already distinct, so only the cross-branch overlap needs removing —
    // a thin broadcast anti-join (entity ids are few), NOT a fat-row
    // dropDuplicates. Doc ids come run-distinct from the extraction pass
    // (contiguity invariant) — zero shuffle instead of a corpus-sized
    // distinct exchange. The corpus-sized doc branch translates through
    // the constant-folded Catalyst path (every field but the id is
    // label-constant; the typed flatMap allocated 3 objects per document).
    val docFiltered = docIds.toDF("doc_id")
      .join(broadcast(entityThin.select(col("curie").as("doc_id"))), Seq("doc_id"), "left_anti")
    Translate.nodes(entityRaw, bcCtx)
      .union(Translate.constNodes(docFiltered, "doc_id", "document", bcCtx))
  }

  /** One property bag column `[(k, (s, arr, t))]` built in Catalyst. */
  private def propsCol(entries: (String, org.apache.spark.sql.Column, String)*) =
    array(entries.map { case (k, v, t) =>
      struct(lit(k).as("k"),
        struct(v.cast("string").as("s"),
          lit(null).cast("array<string>").as("arr"),
          lit(t).as("t")).as("v"))
    }: _*)

  /** MENTIONS edges (doc -> entity). Already distinct per (doc, entity) by
    * construction — no dedup shuffle. The label translation is resolved on
    * the driver (input label -> class -> label_as_edge) and constant-folded
    * into a pure Catalyst select: the 10^7-row hot path never round-trips
    * through JVM objects (measured: the typed-map variant allocated ~10GB/s
    * and drowned in kernel time at 32 threads). */
  def mentionEdges(dm: Dataset[DocMention]): Dataset[KgEdge] = {
    val cls = ctxRef.inputLabelToClass("mentions")
    val spec = ctxRef.specs(cls)
    val label = spec.labelAsEdge.getOrElse(cls)
    dm.select(
      lit(null).cast("string").as("relId"),
      col("doc_id").as("src"),
      col("curie").as("tgt"),
      lit(label).as("label"),
      propsCol(("n", col("n"), "int")).as("props"),
    ).as[KgEdge]
  }

  /** COOCCURS_WITH edges between entities sharing a doc (a < b), with doc
    * counts. Pairs are emitted doc-locally in the extraction pass (narrow),
    * so the only exchange is the final tiny aggregate — no self-join. */
  def cooccurrenceEdges(docs: Dataset[Doc]): Dataset[KgEdge] =
    coocToEdges(Mentions.cooccurrencePairs(docs, bcDict))

  /** [[mentionEdges]] over the dictionary-coded working set: the curie
    * string re-enters via a broadcast hash join on the int rank (codegen'd,
    * scales to million-term dictionaries where a plan-literal array would
    * not) — the corpus-sized rows stay int-keyed until this last select. */
  def mentionEdgesCompact(dmc: Dataset[DocMentionC]): Dataset[KgEdge] = {
    val cls = ctxRef.inputLabelToClass("mentions")
    val spec = ctxRef.specs(cls)
    val label = spec.labelAsEdge.getOrElse(cls)
    dmc.join(broadcast(rankCurie), Seq("rank"))
      .select(
        lit(null).cast("string").as("relId"),
        col("doc_id").as("src"),
        col("curie").as("tgt"),
        lit(label).as("label"),
        propsCol(("n", col("n"), "int")).as("props"),
      ).as[KgEdge]
  }

  /** [[cooccurrenceEdgesFrom]]'s dictionary-coded twin: the pair aggregate
    * shuffles (int, int) keys; ranks decode to curies via two broadcast
    * joins AFTER the aggregate (output is distinct-pair-sized). */
  def cooccurrenceEdgesFromCompact(dmc: Dataset[DocMentionC]): Dataset[KgEdge] = {
    val cls = ctxRef.inputLabelToClass("cooccurs")
    val label = ctxRef.specs(cls).labelAsEdge.getOrElse(cls)
    Mentions.cooccurrencePairsFromCompact(dmc, bcDict)
      .join(broadcast(rankCurie.select(col("rank").as("src_rank"), col("curie").as("src"))),
        Seq("src_rank"))
      .join(broadcast(rankCurie.select(col("rank").as("tgt_rank"), col("curie").as("tgt"))),
        Seq("tgt_rank"))
      .select(
        lit(null).cast("string").as("relId"),
        col("src"), col("tgt"),
        lit(label).as("label"),
        propsCol(("n_docs", col("n_docs"), "int")).as("props"),
      ).as[KgEdge]
  }

  /** Co-occurrence edges derived from the (persisted) DocMention table —
    * no second corpus scan / trie pass; see
    * [[Mentions.cooccurrencePairsFromDocMentions]] for the contiguity
    * contract. This is the path [[run]] uses: one extraction pass feeds
    * nodes, mention edges AND co-occurrence pairs. */
  def cooccurrenceEdgesFrom(dm: Dataset[DocMention]): Dataset[KgEdge] =
    coocToEdges(Mentions.cooccurrencePairsFromDocMentions(dm))

  private def coocToEdges(cooc: DataFrame): Dataset[KgEdge] = {
    val cls = ctxRef.inputLabelToClass("cooccurs")
    val label = ctxRef.specs(cls).labelAsEdge.getOrElse(cls)
    cooc.select(
      lit(null).cast("string").as("relId"),
      col("src"),
      col("tgt"),
      lit(label).as("label"),
      propsCol(("n_docs", col("n_docs"), "int")).as("props"),
    ).as[KgEdge]
  }

  /** Tiny label -> head-ancestor-type map, folded into triple plans as a
    * literal. */
  @transient private lazy val labelTypeMap: Map[String, String] =
    ctxRef.specs.keys.map { k =>
      k -> ctxRef.ancestors.get(k).flatMap(_.headOption)
        .getOrElse(graft.model.Naming.nameSentenceToPascal(k))
    }.toMap

  /** The judged (subj, pred, obj) table: rdf:type triples for every node +
    * one triple per edge. */
  def triples(nodes: Dataset[KgNode], edges: Dataset[KgEdge]): Dataset[Triple] = {
    val typeMap = typedLit(labelTypeMap)
    val typeTriples = nodes.select(
      col("id").as("subj"),
      lit("rdf:type").as("pred"),
      coalesce(element_at(typeMap, col("label")), col("label")).as("obj"),
    ).as[Triple]
    val edgeTriples = edges.select(
      col("src").as("subj"), col("label").as("pred"), col("tgt").as("obj")).as[Triple]
    typeTriples.union(edgeTriples)
  }

  /** Full run: (nodes, mention+cooc edges, triples). The extraction output
    * is persisted and feeds every downstream consumer — the corpus is
    * scanned (and the trie run) exactly ONCE per run. */
  def run(docs: Dataset[Doc]): (Dataset[KgNode], Dataset[KgEdge], Dataset[Triple]) = {
    val dm = docMentions(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ns = nodes(dm)
    val es = mentionEdges(dm).union(cooccurrenceEdgesFrom(dm))
    (ns, es, triples(ns, es))
  }

  /** [[run]] on the dictionary-coded scale path: the persisted working set
    * carries (doc_id, rank:int, n, score) — the cache, every corpus-sized
    * aggregate, and the pair shuffle are int-keyed; strings decode from the
    * broadcast dictionary after the big exchanges. Output is identical to
    * [[run]] (spec-proven) — this is the path the throughput benchmark and
    * a 100-TB deployment use. */
  def runCompact(docs: Dataset[Doc],
      cacheLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      : (Dataset[KgNode], Dataset[KgEdge], Dataset[Triple]) = {
    val dmc = docMentionsCompact(docs).persist(cacheLevel)
    val ns = nodesCompact(dmc)
    val es = mentionEdgesCompact(dmc).union(cooccurrenceEdgesFromCompact(dmc))
    (ns, es, triples(ns, es))
  }

  // ---- fused mention-set path (the production scale path) -------------------

  import org.apache.spark.sql.GraftColumnBridge.{column => exprCol, expression => colExpr}

  /** The FUSED working set: one row per document with >= 1 mention,
    * `(doc_id, pm: array<long>)`, each element `(rank << 32) | n` — built by
    * the codegen'd [[graft.functions.ExtractMentions]] walking span bytes in
    * place (no Doc/Span/String materialization, no encoder round trip).
    * Versus the row-per-mention working set this pays the doc_id string once
    * per DOCUMENT (~4x less cache traffic at ~14 mentions/doc), doc ids are
    * distinct by construction (no run-distinct pass), and per-doc consumers
    * need no run-contiguity contract — each row IS a document. */
  def mentionSets(docs: Dataset[Doc]): DataFrame = {
    // kind/text as parallel GetArrayStructFields extractions: nested schema
    // pruning narrows the parquet ReadSchema to spans.{kind,text} — the
    // scan never decodes media_ref/offset (the whole-struct ExtractMentions
    // form read all four nested columns)
    val extract = exprCol(graft.functions.ExtractMentionsKT(
      colExpr(col("spans.kind")), colExpr(col("spans.text")), bcDict))
    // explode(array(e)) is a pushdown barrier, not a transformation: a bare
    // `select(e as pm).where(size(pm) > 0)` lets PushPredicateThroughNonJoin
    // inline the expression into the filter UNDER the projection, and
    // whole-stage codegen shares no subexpressions across Filter/Project —
    // the trie walk ran TWICE per document (measured +2-3s at 16M docs /
    // 16 cores; ScratchDoubleEval). The Generate evaluates it once and the
    // filter reads the generated column.
    docs.toDF().select(col("doc_id"), explode(array(extract)).as("pm"))
      .where(size(col("pm")) > 0)
  }

  /** [[nodes]] over the mention-set table: the corpus-sized rank distinct
    * runs as a dictionary-bounded per-partition set collector
    * ([[graft.extract.CoocCombine.partialRankSets]] — no explode of the
    * corpus mention stream, no per-mention hash probe); doc ids are
    * one-per-row already. */
  def nodesFromSets(ms: DataFrame): Dataset[KgNode] =
    nodesFromRanks(
      graft.extract.CoocCombine.partialRankSets(
        ms.select(col("pm")).as[Array[Long]], bcDict).toDF("rank"),
      ms.select(col("doc_id")).as[String])

  /** [[mentionEdgesCompact]] over the mention-set table: explode + decode
    * join, all codegen. */
  def mentionEdgesFromSets(ms: DataFrame): Dataset[KgEdge] = {
    val cls = ctxRef.inputLabelToClass("mentions")
    val spec = ctxRef.specs(cls)
    val label = spec.labelAsEdge.getOrElse(cls)
    ms.select(col("doc_id"), explode(col("pm")).as("p"))
      .select(col("doc_id"),
        shiftright(col("p"), 32).cast("int").as("rank"),
        col("p").bitwiseAND(lit(0xffffffffL)).as("n"))
      .join(broadcast(rankCurie), Seq("rank"))
      .select(
        lit(null).cast("string").as("relId"),
        col("doc_id").as("src"),
        col("curie").as("tgt"),
        lit(label).as("label"),
        propsCol(("n", col("n"), "int")).as("props"),
      ).as[KgEdge]
  }

  /** Co-occurrence edges over the mention-set table: per-doc pair emission
    * and the partial count run in ONE primitive per-partition combiner
    * ([[graft.extract.CoocCombine]] — open-addressing long→long map over
    * packed pairs, spill-safe, no object churn, no contiguity contract);
    * the only exchange carries dictionary-bounded (pair, partial) rows,
    * summed in one small final aggregate. */
  def cooccurrenceEdgesFromSets(ms: DataFrame,
      maxEntitiesPerDoc: Int = Mentions.DefaultMaxEntitiesPerDoc): Dataset[KgEdge] = {
    val cls = ctxRef.inputLabelToClass("cooccurs")
    val label = ctxRef.specs(cls).labelAsEdge.getOrElse(cls)
    graft.extract.CoocCombine.partialPairCounts(
        ms.select(col("pm")).as[Array[Long]], bcDict, maxEntitiesPerDoc)
      .toDF("pair", "cnt")
      .groupBy(col("pair")).agg(sum(col("cnt")).as("n_docs"))
      .select(
        shiftright(col("pair"), 32).cast("int").as("src_rank"),
        col("pair").bitwiseAND(lit(0xffffffffL)).cast("int").as("tgt_rank"),
        col("n_docs"))
      .join(broadcast(rankCurie.select(col("rank").as("src_rank"), col("curie").as("src"))),
        Seq("src_rank"))
      .join(broadcast(rankCurie.select(col("rank").as("tgt_rank"), col("curie").as("tgt"))),
        Seq("tgt_rank"))
      .select(
        lit(null).cast("string").as("relId"),
        col("src"), col("tgt"),
        lit(label).as("label"),
        propsCol(("n_docs", col("n_docs"), "int")).as("props"),
      ).as[KgEdge]
  }

  /** [[triples]] built STRAIGHT from the packed mention-set cache — no
    * KgNode/KgEdge row building, no property bags, no count aggregation (a
    * triple is presence, not frequency). Output identical to
    * `triples(nodesFromSets(ms), mentionEdgesFromSets(ms) union
    * cooccurrenceEdgesFromSets(ms))` (spec-proven, PipelineSpec); the plan
    * is the win:
    *  - rank presence AND co-occurrence pairs come from ONE shared combiner
    *    scan ([[graft.extract.CoocCombine.partialPairAndRankKeys]] — ranks
    *    ride as self-pairs, unambiguous because real pairs are strictly
    *    a < b): the distinct packed keys are dictionary-bounded and lazily
    *    `localCheckpoint`ed, so the corpus-sized scan + combiner + distinct
    *    exchange run ONCE per action no matter how many consumers sit above
    *    (measured: AQE did NOT stage-reuse the three analyzer-cloned copies
    *    of the object-operator subtree, so plan-level sharing alone
    *    re-scanned the cache per consumer). The checkpoint is a leaf — a
    *    free pushdown barrier — and its blocks are freed by the
    *    ContextCleaner when the dataset goes unreachable (no cache leak).
    *    Cluster note: the barrier is config-gated. When the SparkContext
    *    has a checkpoint dir (`sc.setCheckpointDir` / a cluster's
    *    `spark.checkpoint.dir`) — and `spark.graft.barrier` is not forced
    *    to `local` — the barrier is a RELIABLE `Dataset.checkpoint(eager =
    *    false)`: blocks live on the cluster FS, so an executor loss
    *    recomputes nothing and fails nothing. Without a checkpoint dir
    *    (the sandbox default) it stays `localCheckpoint`, whose blocks are
    *    lineage-truncated — an executor loss fails the job, acceptable
    *    because the data is ≤ C(|dict|, 2) longs and job-level retry is
    *    cheap at that size. Both paths spec-proven identical
    *    (PipelineSpec);
    *  - mention triples are explode + broadcast rank decode + a 3-column
    *    select (the KgEdge path built a props bag per row);
    *  - doc rdf:type triples are a doc_id-only cache read (nested-column
    *    pruned) + the same broadcast anti-join as the node path — the
    *    constant obj is resolved on the driver from the SAME translation
    *    tables ([[labelTypeMap]]), so parity cannot drift;
    *  - co-occurrence triples decode the distinct pairs only (no n_docs
    *    sum — the aggregate the edge path pays is dropped, not pruned). */
  def triplesFromSets(ms: DataFrame,
      maxEntitiesPerDoc: Int = Mentions.DefaultMaxEntitiesPerDoc): Dataset[Triple] = {
    val typeMap = typedLit(labelTypeMap)
    val distinctKeys = graft.extract.CoocCombine.partialPairAndRankKeys(
        ms.select(col("pm")).as[Array[Long]], bcDict, maxEntitiesPerDoc)
      .toDF("k").distinct()
    // lazy barrier: materializes with the first action; reliable (cluster-FS)
    // when a checkpoint dir is configured, local blocks otherwise — see the
    // cluster note above and graft.Barrier.
    val keys = Barrier(distinctKeys)
    val hi = shiftright(col("k"), 32).cast("int")
    val lo = col("k").bitwiseAND(lit(0xffffffffL)).cast("int")
    val entityThin = entityThinFromRanks(keys.filter(hi === lo).select(hi.as("rank")))
    val entityRaw = entityThin
      .as[(String, String, String)]
      .map { case (curie, cls, surface) =>
        RawNode(curie, cls, Props.of("name" -> PV.str(surface)))
      }
    val entityType = Translate.nodes(entityRaw, bcCtx).select(
      col("id").as("subj"),
      lit("rdf:type").as("pred"),
      coalesce(element_at(typeMap, col("label")), col("label")).as("obj"))
    val docType = ctxRef.inputLabelToClass.get("document") match {
      case None => spark.emptyDataset[Triple].toDF()
      case Some(cls) =>
        // KgNode.make keeps the class name as the label, so the rdf:type
        // obj of every document node is one driver-resolved constant
        val obj = labelTypeMap.getOrElse(cls, cls)
        ms.select(col("doc_id"))
          .join(broadcast(entityThin.select(col("curie").as("doc_id"))),
            Seq("doc_id"), "left_anti")
          .select(col("doc_id").as("subj"),
            lit("rdf:type").as("pred"), lit(obj).as("obj"))
    }
    val mentionCls = ctxRef.inputLabelToClass("mentions")
    val mentionLabel = ctxRef.specs(mentionCls).labelAsEdge.getOrElse(mentionCls)
    val mentionTriples = ms.select(col("doc_id"), explode(col("pm")).as("p"))
      .select(col("doc_id"), shiftright(col("p"), 32).cast("int").as("rank"))
      .join(broadcast(rankCurie), Seq("rank"))
      .select(col("doc_id").as("subj"),
        lit(mentionLabel).as("pred"), col("curie").as("obj"))
    val coocCls = ctxRef.inputLabelToClass("cooccurs")
    val coocLabel = ctxRef.specs(coocCls).labelAsEdge.getOrElse(coocCls)
    val coocTriples = keys.filter(hi =!= lo)
      .select(hi.as("src_rank"), lo.as("tgt_rank"))
      .join(broadcast(rankCurie.select(col("rank").as("src_rank"), col("curie").as("src"))),
        Seq("src_rank"))
      .join(broadcast(rankCurie.select(col("rank").as("tgt_rank"), col("curie").as("tgt"))),
        Seq("tgt_rank"))
      .select(col("src").as("subj"), lit(coocLabel).as("pred"), col("tgt").as("obj"))
    entityType.union(docType).union(mentionTriples).union(coocTriples).as[Triple]
  }

  /** [[run]] on the fused mention-set path — the path the throughput
    * benchmark and a 100-TB deployment use. Output identical to [[run]] and
    * [[runCompact]] (spec-proven). The triple table is built by
    * [[triplesFromSets]] (same rows as `triples(ns, es)`, shared-scan
    * plan); `ns`/`es` stay lazy, so a triples-only consumer never pays the
    * entity-row builds. */
  def runFused(docs: Dataset[Doc],
      cacheLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      : (Dataset[KgNode], Dataset[KgEdge], Dataset[Triple]) = {
    val ms = mentionSets(docs).persist(cacheLevel)
    val ns = nodesFromSets(ms)
    val es = mentionEdgesFromSets(ms).union(cooccurrenceEdgesFromSets(ms))
    (ns, es, triplesFromSets(ms))
  }
}

object KgPipeline {

  /** One pipeline per (SparkContext, config): the schema/ontology parse,
    * trie build and the two broadcasts are CONSTANTS of the domain, not
    * per-query work — 30+ query builders each paid them before this memo
    * (guide §1.2 "per-task work" at the driver). Keyed on the CONTEXT
    * (broadcasts are context-level, so one pipeline serves child sessions
    * too — the streaming rows already rely on that); not a result cache:
    * nothing here derives from input data. */
  private val pipelines =
    new java.util.concurrent.ConcurrentHashMap[(org.apache.spark.SparkContext, KgConfig), KgPipeline]()

  /** The standard demo pipeline over the analytics domain. */
  def analytics(spark: SparkSession, config: KgConfig = KgConfig()): KgPipeline =
    pipelines.computeIfAbsent((spark.sparkContext, config), _ =>
      new KgPipeline(spark, AnalyticsDomain.context(config), AnalyticsDomain.dict))
}
