package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, fingerprinting, language signals. All pure
  * Catalyst expressions (whole-stage-codegen'd, no UDFs), all integer-exact
  * so results are engine-portable (DuckDB oracle parity).
  */
object TextOps {

  /** 56-bit deterministic token hash, portable across engines:
    * first 14 hex chars of md5. */
  def tokenHash(c: Column): Column =
    conv(substring(md5(encode(c, "UTF-8")), 1, 14), 16, 10).cast("long")

  val Mod: Long = 1000000007L

  def tokens(text: Column): Column = split(text, " ")

  /** Non-empty tokens via codegen'd `array_remove` — bit-identical to
    * `filter(toks, x => x =!= "")` (split yields no nulls, order kept),
    * but higher-order `filter` lambdas are INTERPRETED per element (r9,
    * guide §4) while ArrayRemove is whole-stage codegen. */
  private[graft] def tokensNonEmpty(text: Column): Column =
    array_remove(tokens(text), "")

  /** Occurrence count of `term` in a token array, codegen'd:
    * `size(filter(toks, x => x === term))` == size(toks) −
    * size(array_remove(toks, term)) — same interpreted-lambda escape. */
  private[graft] def countOcc(toks: Column, term: String): Column =
    (size(toks) - size(array_remove(toks, term))).cast("long")

  /** (doc_id, n_tokens, n_distinct, n_chars). */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("n_distinct"),
      length(col("text")).cast("long").as("n_chars"),
    )

  /** Corpus profile: per-(source, lang) document/token/char totals and
    * mean document length — the first report any mixture or filtering
    * decision is made from (and the input [[graft.ops.SampleOps
    * .mixtureSample]] shares are chosen against). ONE scan, one
    * map-side-combined hash aggregate; the shuffle carries ≤
    * |sources|×|langs| rows. The mean is a single division of exact long
    * sums (IEEE-identical across engines), rounded to 6 places. */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .select(col("source"), col("lang"),
        size(tokens(col("text"))).cast("long").as("_n"),
        length(col("text")).cast("long").as("_c"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum("_n").as("n_tokens"),
        sum("_c").as("n_chars"),
        round(sum("_n").cast("double") / count(lit(1)), 6).as("avg_tokens"))

  /** BPE-style pre-tokenization count — the GPT-2-ish splitter shape
    * (letter runs, digit runs, punctuation runs, each with an optional
    * leading space; no lookarounds, so the pattern is portable between
    * Java regex and DuckDB's RE2): (doc_id, n_bpe). The real byte-pair
    * merge table is model-specific; the pre-tokenizer is the part a data
    * pipeline counts with. */
  def bpeTokenCounts(documents: DataFrame): DataFrame = {
    val pat = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"
    documents.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as("n_bpe"))
  }

  /** Quality metrics: token stats, stopword ratio, mean token length
    * (space-separated text => sum(len) = chars - (tokens-1)), and a simple
    * quality class. Ratios are single divisions of exact longs —
    * deterministic across engines. */
  def qualityScores(documents: DataFrame, stopwords: Seq[String] = Seq("a", "the")): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    // codegen'd stopword count: total minus the array with every stopword
    // removed (== the interpreted isin-filter's size, r9 guide §4)
    val nStop = (size(toks) -
      size(stopwords.foldLeft(toks)((acc, sw) => array_remove(acc, sw)))).cast("long")
    val sumLen = (length(col("text")) - (size(toks) - 1)).cast("long")
    documents.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      nStop.as("n_stopwords"),
      (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"),
      (sumLen.cast("double") / nTok.cast("double")).as("mean_token_len"),
      when(nTok < 20, "short")
        .when(nStop.cast("double") / nTok.cast("double") > lit(0.2), "boilerplate")
        .otherwise("good").as("quality"),
    )
  }

  /** Order-sensitive document fingerprint: sum over tokens of
    * (hash(token) mod M) * position, mod M. Exact integer arithmetic. */
  def fingerprints(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val contrib = zip_with(
      transform(toks, t => pmod(tokenHash(t), lit(Mod))),
      sequence(lit(1L), size(toks).cast("long")),
      (h, i) => pmod(h * i, lit(Mod)),
    )
    documents.select(
      col("doc_id"),
      pmod(aggregate(contrib, lit(0L), (acc, x) => acc + x), lit(Mod)).as("fingerprint"),
    )
  }

  /** Distinct hashed word n-grams of a text column (portable 56-bit md5
    * hashes mod [[Mod]]); a doc shorter than `n` tokens contributes its
    * whole text as one gram — the same convention as the shingle family.
    *
    * r9: one fused codegen'd expression ([[graft.functions.NgramHashSet]])
    * instead of the interpreted transform chain that allocated the joined
    * gram string, its UTF-8 encode copy, the md5 hex string and the conv
    * parse per gram occurrence — bit-identical results (NgramHashSpec
    * parity suite + the DuckDB oracle). */
  def ngramHashes(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.functions.NgramHashSet(expression(tokens(text)), n, Mod))
  }

  /** Benchmark-contamination check — the GPT-3/C4-style n-gram overlap
    * decontamination pass: score every corpus document by how many of its
    * distinct word n-grams appear anywhere in the benchmark (eval) set.
    * Returns (doc_id, n_grams, n_hits, contamination).
    *
    * Scale shape: the benchmark side is dims-sized (eval suites are MBs
    * against a 100-TB corpus), so its distinct gram hashes BROADCAST; the
    * corpus side is one narrow explode + broadcast left join, and the
    * per-doc re-aggregation partial-aggregates map-side back to one row
    * per document before the only shuffle (O(docs) thin rows). The corpus
    * text is never shuffled and never compared pairwise. */
  def ngramContamination(documents: DataFrame, benchmark: DataFrame,
      n: Int = 3): DataFrame = {
    val bench = broadcast(
      benchmark.select(explode(ngramHashes(col("text"), n)).as("h")).distinct()
        .withColumn("_hit", lit(1L)))
    documents
      .select(col("doc_id"), explode(ngramHashes(col("text"), n)).as("h"))
      .join(bench, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_hits"),
        round(col("n_hits").cast("double") / col("n_grams"), 6).as("contamination"))
  }

  /** Within-document repetition signal — the Gopher/C4-style repeated-
    * n-gram quality filter: fraction of word n-grams that are repeats
    * (1 - distinct/total). Pure per-row array arithmetic, absorbed by the
    * scan (no shuffle, no UDF). Returns (doc_id, n_grams, n_distinct,
    * repetition). */
  def repetitionScores(documents: DataFrame, n: Int = 2): DataFrame = {
    val toks = tokens(col("text"))
    val grams = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))
    documents.select(
      col("doc_id"),
      size(grams).cast("long").as("n_grams"),
      size(array_distinct(grams)).cast("long").as("n_distinct"),
      round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 6)
        .as("repetition"),
    )
  }

  // ------------------------------------------------------------------ BPE

  /** Learn a byte-pair-encoding merge table (Sennrich-style) from the
    * corpus. The corpus first collapses to its word-frequency dict — one
    * distinct+count aggregate; with the `maxVocab` cap the dict is
    * dimension-sized for any real corpus (the standard BPE-learning input) —
    * then merges are derived greedily on the driver: per round, the most
    * frequent adjacent symbol pair wins (ties -> lexicographically smallest
    * pair), and is applied left-to-right non-overlapping. Fully
    * deterministic. Returns merges in rank order.
    */
  def bpeLearnMerges(documents: DataFrame, nMerges: Int,
      maxVocab: Int = 4096): Seq[(String, String)] = {
    val wf = documents.select(explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      wf.map { case (w, f) => (w.split("").filter(_.nonEmpty), f) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    while (round < nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + f
      }
      if (counts.isEmpty) round = nMerges
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (applyMergeLR(syms, best), f) }
        round += 1
      }
    }
    merges.toSeq
  }

  /** One merge applied left-to-right, non-overlapping — the convention both
    * the learner and the encoder (and the SQL oracle's `replace`) share. */
  private def applyMergeLR(syms: Array[String], m: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Vocabulary of a merge table: the base character alphabet (sorted)
    * followed by the merge outputs in rank order; id = position. */
  def bpeVocab(merges: Seq[(String, String)]): Map[String, Int] = {
    val base = merges.flatMap { case (a, b) => (a + b).split("").toSeq }
      .filter(_.nonEmpty).distinct.sorted
    val syms = base ++ merges.map { case (a, b) => a + b }
    syms.distinct.zipWithIndex.toMap
  }

  /** Catalyst BPE word encoder: the word becomes its leading-space symbol
    * string (" h e l l o"), then each merge in RANK ORDER is one
    * left-to-right non-overlapping literal replace — the classic Sennrich
    * encode, expressed as a codegen'd regexp_replace chain. Leading-space
    * (not surrounding-space) delimiting keeps adjacent merge sites
    * independent: replacing " l l" in " l l l l" leaves " ll ll", where a
    * surrounding-space pattern would consume the shared delimiter and skip
    * every other site. Returns the symbol ARRAY column. */
  def bpeEncodeSymbols(word: Column, merges: Seq[(String, String)]): Column = {
    // Spark's split("", -1) keeps a trailing empty element (DuckDB's does
    // not) — drop empties so both sides see the same symbol string
    val spaced = concat(lit(" "),
      array_join(filter(split(word, ""), c => c =!= lit("")), " "))
    // Replacement strings are Java Matcher templates ('$'/'\' are special),
    // so quote them too — a merge symbol like "$100" must replace literally.
    val encoded = merges.foldLeft(spaced) { case (acc, (a, b)) =>
      regexp_replace(acc,
        lit(java.util.regex.Pattern.quote(s" $a $b")),
        lit(java.util.regex.Matcher.quoteReplacement(s" $a$b")))
    }
    split(trim(encoded), " ")
  }

  /** Corpus BPE encoding summary: (doc_id, n_bpe_tokens, id_sum). The
    * expensive regexp chain runs once per DISTINCT word (the vocab is
    * dimension-sized; at 100 TB this is encode-the-vocab + broadcast-join,
    * never encode-every-occurrence), then per-doc aggregation of the two
    * exact-integer summaries. Symbols outside `vocabIds` map to -1. */
  def bpeEncode(documents: DataFrame, merges: Seq[(String, String)],
      vocabIds: Map[String, Int]): DataFrame = {
    val ids = typedLit(vocabIds)
    val encoded = documents
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "").distinct()
      .select(col("w"), bpeEncodeSymbols(col("w"), merges).as("syms"))
      .select(col("w"),
        size(col("syms")).cast("long").as("n_sym"),
        aggregate(
          transform(col("syms"), s => coalesce(element_at(ids, s), lit(-1)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("w_id_sum"))
    documents.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(encoded), "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_sym")).as("n_bpe_tokens"), sum(col("w_id_sum")).as("id_sum"))
  }

  /** RE2-compatible PII patterns (no lookarounds/backrefs, so Java regex
    * and the DuckDB oracle agree). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction: replace emails and IPv4 addresses with typed
    * placeholder tokens, and count what was redacted. A pure
    * regexp_replace/regexp_count chain — codegen'd, narrow, absorbed by
    * the scan pipeline (the 100-TB shape for a scrub pass). Returns
    * (doc_id, clean_text, n_pii). */
  def redactPii(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents.select(
      col("doc_id"),
      regexp_replace(regexp_replace(col(textCol),
        lit(EmailRe), lit("<EMAIL>")), lit(Ipv4Re), lit("<IP>")).as("clean_text"),
      (regexp_count(col(textCol), lit(EmailRe)) +
        regexp_count(col(textCol), lit(Ipv4Re))).cast("long").as("n_pii"),
    )

  /** Language-marker signal: per-document counts of per-language marker
    * tokens, predicted language = argmax (ties -> lexicographic marker
    * order). With a synthetic vocabulary this demonstrates the operator
    * shape (n-gram/marker profile scoring) with portable determinism. */
  def langId(documents: DataFrame, markers: Seq[(String, String)] =
      Seq("the" -> "en", "a" -> "es", "data" -> "de")): DataFrame = {
    val toks = tokens(col("text"))
    val counts = markers.map { case (m, lang) =>
      countOcc(toks, m).as(s"n_$lang")
    }
    val withCounts = documents.select((col("doc_id") +: col("lang").as("actual_lang") +: counts): _*)
    // argmax with deterministic tie-break: earlier marker in list wins ties
    val best = markers.map(_._2).tail.foldLeft(
      (lit(markers.head._2), col(s"n_${markers.head._2}"))
    ) { case ((bl, bc), lang) =>
      val c = col(s"n_$lang")
      (when(c > bc, lit(lang)).otherwise(bl), when(c > bc, c).otherwise(bc))
    }._1
    withCounts.withColumn("predicted_lang", best)
      .withColumn("agrees", col("predicted_lang") === col("actual_lang"))
  }

  /** One-scan C4/Gopher-style quality FILTER — the composition a cleaning
    * pipeline actually runs: token count, stopword ratio, repeated-bigram
    * fraction and marker-based language-ID are computed together as pure
    * Catalyst expressions over the SAME bound token array in ONE
    * projection over ONE corpus scan (never a join of the per-signal
    * DataFrames — that shape re-scans the corpus once per signal), then a
    * narrow filter keeps the documents passing every gate. Survivors come
    * back with their signal columns so the next stage reads the decided
    * values instead of recomputing them. Signal semantics are exactly
    * [[tokenCounts]]/[[qualityScores]]/[[repetitionScores]]/[[langId]]'s
    * (same expressions, same rounding), so the gates compose with the
    * standalone scorers' numbers. `keepLangs` empty = no language gate. */
  def qualityFilter(documents: DataFrame, minTokens: Long = 5,
      maxStopRatio: Double = 0.5, maxRepetition: Double = 0.5,
      keepLangs: Seq[String] = Nil,
      stopwords: Seq[String] = Seq("a", "the"),
      markers: Seq[(String, String)] = Seq("the" -> "en", "a" -> "es", "data" -> "de")): DataFrame = {
    val toks = col("_toks")
    val nTok = size(toks).cast("long")
    // codegen'd counts (see qualityScores/countOcc — the interpreted
    // filter lambdas ran per token per gate)
    val nStop = (size(toks) -
      size(stopwords.foldLeft(toks: Column)((acc, sw) => array_remove(acc, sw)))).cast("long")
    val grams = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => array_join(slice(toks, i, lit(2)), " ")))
      .otherwise(array(array_join(toks, " ")))
    val repetition =
      round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams), 6)
    val langCounts: Seq[(String, Column)] = markers.map { case (m, lang) =>
      lang -> countOcc(toks, m)
    }
    val predictedLang = langCounts.tail.foldLeft(
      (lit(langCounts.head._1), langCounts.head._2)
    ) { case ((bl, bc), (lang, c)) =>
      (when(c > bc, lit(lang)).otherwise(bl), when(c > bc, c).otherwise(bc))
    }._1
    val langOk =
      if (keepLangs.isEmpty) lit(true) else col("predicted_lang").isin(keepLangs: _*)
    // the signal struct rides an explode(array(e)) Generate — a predicate-
    // pushdown BARRIER (the mentionSets trick): with the plain
    // withColumn+filter shape, PushPredicateThroughNonJoin copied the full
    // signal expressions into a Filter BELOW the projection, where every
    // `_toks` reference re-ran split(text) — the token array was split and
    // the bigram array rebuilt once per gate, in the filter AND again in
    // the projection. Behind the Generate each signal is computed exactly
    // once and the filter reads the generated fields.
    val sig = struct(
      nTok.as("n_tokens"),
      (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"),
      repetition.as("repetition"),
      predictedLang.as("predicted_lang"))
    documents
      .withColumn("_toks", tokens(col("text")))
      .select(col("*"), explode(array(sig)).as("_q"))
      .drop("_toks")
      .withColumn("n_tokens", col("_q.n_tokens"))
      .withColumn("stopword_ratio", col("_q.stopword_ratio"))
      .withColumn("repetition", col("_q.repetition"))
      .withColumn("predicted_lang", col("_q.predicted_lang"))
      .drop("_q")
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") <= maxStopRatio &&
        col("repetition") <= maxRepetition && langOk)
  }

  /** Non-empty consecutive token pairs of a text column as "w1 w2"
    * strings — the bigram stream of [[lmScore]]. */
  private def bigramsOf(text: Column): Column = {
    val t = tokensNonEmpty(text)
    val len = greatest(size(t) - 1, lit(0))
    zip_with(
      slice(t, lit(1), len),
      slice(t, lit(2), len),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Corpus-trained bigram LM document scorer — the CCNet-style
    * "perplexity filter" shape for training-data quality: train add-one-
    * smoothed bigram log-probabilities on the corpus itself, score each
    * document by its summed bigram log-likelihood, flag the low-likelihood
    * tail for removal. Output: (doc_id, n_bigrams, log_prob, avg_log_prob)
    * for every document with ≥ 1 bigram; `log_prob = Σ ln((c12 + 1) /
    * (c1 + V))` over the doc's consecutive token pairs, V = model
    * unigram-row count. Sums round to 6 dp (the recall-row discipline —
    * the one double surface; everything upstream is exact counts).
    *
    * Scale shape: the model is CAPPED at the top-`maxModel` bigrams and
    * unigrams by (count desc, token asc) — deterministic under ties — so
    * both sides of the scoring join BROADCAST regardless of corpus size;
    * training is two explode + map-side-combined aggregates (the shuffles
    * carry distinct tokens, not occurrences) + one TakeOrdered each.
    * Scoring is one explode + two broadcast hash joins + a map-side-
    * combined per-doc sum: the corpus is shuffled once, on thin
    * (doc_id, double) partials. Out-of-model tokens smooth to c = 0 —
    * the cap degrades the tail of the model, never correctness.
    *
    * The unigram model is trained EAGERLY at call time (one corpus scan)
    * and collected to the driver — it is ≤ `maxModel` rows by construction
    * — so `V` (the smoothing denominator's model-row count) and the join
    * side come from the SAME single pass; the join side re-enters the plan
    * as a LocalRelation (no cache entry to leak, broadcast is free). The
    * returned plan then pays exactly two corpus scans (bigram model +
    * scoring) — three total, not the four a lazy-V formulation costs
    * (VERDICT r7 #3). */
  def lmScore(documents: DataFrame, maxModel: Int = 1 << 16): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val bg = bigramsOf(col("text"))
    val uniRows = documents
      .select(explode(tokensNonEmpty(col("text"))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      .orderBy(col("c1").desc, col("w1")).limit(maxModel)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val v = uniRows.length.toLong
    val uniTop = uniRows.toSeq.toDF("w1", "c1")
    val bigTop = documents
      .select(explode(bg).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c12"))
      .orderBy(col("c12").desc, col("b")).limit(maxModel)
    documents.select(col("doc_id"), explode(bg).as("b"))
      .join(broadcast(bigTop), Seq("b"), "left")
      .withColumn("w1", split(col("b"), " ").getItem(0))
      .join(broadcast(uniTop), Seq("w1"), "left")
      .select(col("doc_id"),
        log((coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + lit(v)).cast("double")).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")), 6).as("log_prob"),
        round(sum(col("lp")) / count(lit(1)), 6).as("avg_log_prob"))
  }

  /** Per-document keyword extraction — top-`k` distinctive tokens: rank by
    * in-doc term frequency AFTER dropping corpus-common tokens (document
    * frequency above `maxDfPpm` parts-per-million of the corpus — the
    * principled stop-word filter: df does idf's common-token suppression).
    * Ranking is the INTEGER triple (tf desc, df asc — rarer wins ties,
    * token asc) so the cut is engine-exact; a floating tf·ln(N/df) rank
    * would let a 1-ulp libm divergence flip near-equal ranks across
    * engines (the house integer-exact discipline; classic tf-idf's
    * mathematically-equal-but-differently-computed scores, e.g.
    * 2·ln(N/x) vs ln(N/x²), make that flip REACHABLE, not hypothetical).
    * Output: (doc_id, token, tf, df, rn), rn 1..k.
    *
    * 100-TB shape: tf and df are map-side-combined aggregates; their join
    * keys on the token — vocabulary-sized, NOT dictionary-bounded, so it
    * is an honest shuffle hash join (a capped broadcast model would
    * silently drop the RARE tokens, which are exactly the keywords —
    * the opposite trade from lmScore's head-of-distribution model). The
    * per-doc window is bounded by document length. N folds in lazily. */
  def keywords(documents: DataFrame, k: Int = 3,
      maxDfPpm: Long = 100000L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val toks = documents.select(col("doc_id"),
      explode(tokensNonEmpty(col("text"))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nRow = broadcast(documents.agg(count(lit(1)).as("n_total")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(df, Seq("token"))
      .crossJoin(nRow)
      .filter(col("df") * lit(1000000L) <= lit(maxDfPpm) * col("n_total"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("token"), col("tf").cast("long").as("tf"),
        col("df").cast("long").as("df"), col("rn").cast("long").as("rn"))
  }

  /** Integer fixed-point BM25 retrieval: top-`k` documents for a literal
    * term query — the corpus-curation retrieval step (find the documents
    * about X; seed a topic filter; build an eval slice).
    *
    * House exactness discipline: the classic BM25
    * `idf = ln((N-df+0.5)/(df+0.5))` is replaced by its ARGUMENT as
    * fixed-point `idf_ppm = ((2(N-df)+1)·1e6) div (2df+1)` — ln is
    * deliberately dropped. Per term that is a monotone rescoring; across
    * the sum it weights rare terms MORE aggressively than log-idf (a
    * documented deviation, not an approximation error), and in exchange
    * every score is bit-exact across engines, partitionings and reduce
    * orders (the text_keywords rationale: two libm ln's need not agree,
    * a div always does). TF saturation keeps real BM25 shape with
    * k1 = 1.2, b = 0.75 in milli-units:
    * {{{
    *   avgdl_m = (Σdl·1000) div N
    *   norm_m  = 250 + (dl·750·1000) div avgdl_m      // (1-b) + b·dl/avgdl
    *   denom_m = tf·1000 + (1200·norm_m) div 1000     // tf + k1·norm
    *   sat_ppm = (tf·2200·1e6) div denom_m            // tf·(k1+1)/denom
    *   score   = Σ_terms (idf_ppm·sat_ppm) div 1e6
    * }}}
    * All quantities non-negative, so Spark's truncating `div` and
    * DuckDB's floor `//` agree; products run in decimal(38,0) (HUGEINT
    * on the oracle side) with headroom past 10^12 documents.
    *
    * 100-TB shape: ONE corpus scan computes the thin per-doc row
    * (doc_id, dl, per-query-term tf — query-sized, not vocab-sized),
    * barriered so the stats aggregate and the scoring branch share it;
    * df and the corpus stats are single-row/query-sized broadcasts; the
    * only O(docs) movement is the TakeOrderedAndProject top-k (ties
    * broken on doc_id — a deterministic cutoff, never an engine race). */
  def bm25TopK(documents: DataFrame, queryTerms: Seq[String], k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, s"duplicate query terms: $queryTerms")
    require(k > 0, s"k must be positive: $k")
    val tfStructs = array(queryTerms.map(q =>
      struct(lit(q).as("term"), countOcc(col("_t"), q).as("tf"))): _*)
    val perDoc = documents
      .withColumn("_t", tokensNonEmpty(col("text")))
      .select(col("doc_id"), size(col("_t")).cast("long").as("dl"),
        tfStructs.as("_tfs"))
      // thin (id, dl, |query| longs) rows; the lazy barrier shares the
      // single extraction scan between the stats and scoring branches
      .transform(df => graft.Barrier(df))
    val stats = broadcast(perDoc.agg(
      count(lit(1)).cast("long").as("n_total"),
      sum(col("dl")).cast("long").as("sum_dl")))
    val qrows = perDoc
      .select(col("doc_id"), col("dl"), explode(col("_tfs")).as("e"))
      .select(col("doc_id"), col("dl"), col("e.term").as("term"),
        col("e.tf").as("tf"))
      .filter(col("tf") > 0)
    val dfSide = broadcast(
      qrows.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df")))
    qrows.join(dfSide, Seq("term")).crossJoin(stats)
      .withColumn("avgdl_m",
        expr("(cast(sum_dl as decimal(38,0)) * 1000) div n_total"))
      .withColumn("idf_ppm", expr(
        "((2 * (cast(n_total as decimal(38,0)) - df) + 1) * 1000000) div (2 * df + 1)"))
      .withColumn("norm_m",
        expr("250 + (cast(dl as decimal(38,0)) * 750 * 1000) div avgdl_m"))
      .withColumn("denom_m",
        expr("tf * 1000 + (1200 * cast(norm_m as decimal(38,0))) div 1000"))
      .withColumn("sat_ppm",
        expr("(cast(tf as decimal(38,0)) * 2200 * 1000000) div denom_m"))
      .withColumn("contrib",
        expr("(cast(idf_ppm as decimal(38,0)) * sat_ppm) div 1000000"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("long").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)
  }
}
