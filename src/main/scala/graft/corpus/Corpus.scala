package graft.corpus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Doc, Span}

/** Deterministic corpus handling: the driver-mandated interleaved
  * text+media document table (BASELINE.json input_hint:
  * doc_id:string, spans:array<struct<kind,text,media_ref,offset>>).
  *
  * Two sources, both reproducible with no RNG:
  *  - [[fromDocumentsTable]] adapts the driver's `documents.parquet`
  *    (doc_id, text, lang, source, n_chars) into interleaved Docs;
  *  - [[synthesize]] generates an arbitrary-size corpus from a splitmix64
  *    counter stream (for scale benchmarks; content embeds dictionary
  *    terms so the extraction stage has realistic hit rates).
  */
object Corpus {

  /** Adapt the driver test table into the interleaved Doc shape.
    * Deterministic: one text span carrying the full text at offset 0; docs
    * with even ids also get a trailing media span (interleaving is
    * exercised harder by [[synthesize]] in unit tests). Pure Catalyst. */
  def fromDocumentsTable(documents: DataFrame): Dataset[Doc] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id").cast("string").as("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        array(
          struct(lit("text").as("kind"), col("text").as("text"),
            lit(null).cast("string").as("media_ref"), lit(0).as("offset")),
          struct(lit("image").as("kind"), lit(null).cast("string").as("text"),
            concat(lit("media://img/"), col("doc_id")).as("media_ref"), lit(1).as("offset")),
        )
      ).otherwise(
        array(
          struct(lit("text").as("kind"), col("text").as("text"),
            lit(null).cast("string").as("media_ref"), lit(0).as("offset")))
      ).as("spans"),
    ).as[Doc]
  }

  /** splitmix64 — the standard public-domain mixing function. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic synthetic corpus of `nDocs` interleaved docs. Texts are
    * drawn from `vocab` (which should include the extraction dictionary's
    * surface forms); every doc interleaves 1-3 text spans with 0-2 media
    * spans. Distributed via spark.range — generation is embarrassingly
    * parallel and reproducible per doc id (no RNG, resume-safe). */
  def synthesize(
      spark: SparkSession,
      nDocs: Long,
      vocab: IndexedSeq[String],
      seed: Long = 42L,
      meanWords: Int = 40,
      numPartitions: Int = 0,
  ): Dataset[Doc] = {
    import spark.implicits._
    val vocabB = spark.sparkContext.broadcast(vocab)
    // numPartitions > 0 pins a SIZE-BASED layout independent of the session's
    // core count — the honest analogue of a cluster reading fixed-size input
    // splits (a core-count layout gives different physical jobs, and GB-scale
    // cache blocks, at different parallelism levels)
    val idRange = if (numPartitions > 0) spark.range(0, nDocs, 1, numPartitions)
                  else spark.range(nDocs)
    idRange.mapPartitions { ids =>
      val v = vocabB.value
      // one builder per partition, reset per span: the synthesis pass is
      // allocation-bound at high thread counts, and builder-array churn was
      // a measurable slice of it
      val sb = new java.lang.StringBuilder(256)
      ids.map { id =>
      var h = splitmix64(seed ^ id)
      def nextInt(bound: Int): Int = { h = splitmix64(h); (((h >>> 33) % bound).toInt + bound) % bound }
      val nTextSpans = 1 + nextInt(3)
      val nMedia = nextInt(3)
      val wordsPerSpan = math.max(3, meanWords / nTextSpans)
      val spans = Vector.newBuilder[Span]
      var offset = 0
      var mediaLeft = nMedia
      (0 until nTextSpans).foreach { si =>
        val nw = wordsPerSpan / 2 + nextInt(math.max(1, wordsPerSpan))
        sb.setLength(0)
        (0 until nw).foreach { wi =>
          if (wi > 0) sb.append(' ')
          sb.append(v(nextInt(v.length)))
        }
        spans += Span("text", sb.toString, null, offset)
        offset += 1
        if (mediaLeft > 0 && si < nTextSpans - 1) {
          val kind = if (nextInt(2) == 0) "image" else "audio"
          spans += Span(kind, null, s"media://$kind/$id/$offset", offset)
          offset += 1
          mediaLeft -= 1
        }
      }
      while (mediaLeft > 0) {
        spans += Span("video", null, s"media://video/$id/$offset", offset)
        offset += 1
        mediaLeft -= 1
      }
      Doc(s"doc$id", spans.result())
      }
    }
  }

  /** [[synthesize]] with a GEOMETRIC hub-entity skew injected on top: term
    * k of `hubTerms` is added to a doc's first text span with probability
    * 2^-(k+1) — the head term appears in ~50% of ALL documents, harder than
    * a Zipf tail (VERDICT r5 #3: the hub-entity extreme). Deterministic
    * (same splitmix64 counter stream), so the skewed corpus is reproducible
    * at any scale and the string/fused path comparison is exact. */
  def synthesizeSkewed(
      spark: SparkSession,
      nDocs: Long,
      vocab: IndexedSeq[String],
      hubTerms: IndexedSeq[String],
      seed: Long = 42L,
      meanWords: Int = 40,
      numPartitions: Int = 0,
  ): Dataset[Doc] = {
    import spark.implicits._
    val base = synthesize(spark, nDocs, vocab, seed, meanWords, numPartitions)
    val hubB = spark.sparkContext.broadcast(hubTerms)
    implicit val enc = org.apache.spark.sql.Encoders.product[Doc]
    base.mapPartitions { it =>
      val hubs = hubB.value
      val sb = new java.lang.StringBuilder(64)
      it.map { d =>
        // independent hub stream keyed off the doc id (stable under any
        // change to the base generator's draw count)
        var h = splitmix64(seed ^ 0x48554253L ^ d.doc_id.hashCode.toLong)
        sb.setLength(0)
        var k = 0
        while (k < hubs.length && k < 20) {
          h = splitmix64(h)
          // P(include term k) = 2^-(k+1)
          if ((h & ((1L << (k + 1)) - 1)) == 0) {
            if (sb.length > 0) sb.append(' ')
            sb.append(hubs(k))
          }
          k += 1
        }
        if (sb.length == 0) d
        else {
          val i = d.spans.indexWhere(_.kind == "text")
          if (i < 0) d
          else {
            val s = d.spans(i)
            d.copy(spans = d.spans.updated(i, s.copy(text = sb.toString + " " + s.text)))
          }
        }
      }
    }
  }
}
