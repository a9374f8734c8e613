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
