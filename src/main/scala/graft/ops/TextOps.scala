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

  /** (doc_id, n_tokens, n_distinct, n_chars). */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("n_distinct"),
      length(col("text")).cast("long").as("n_chars"),
    )

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
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
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
    * whole text as one gram — the same convention as the shingle family. */
  def ngramHashes(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))
    array_distinct(transform(grams, g => pmod(tokenHash(g), lit(Mod))))
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
      size(filter(toks, t => t === m)).cast("long").as(s"n_$lang")
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
}
