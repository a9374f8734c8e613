package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. All hashing is md5-derived integer
  * arithmetic — deterministic and portable across engines, so every
  * operator has an exact DuckDB oracle.
  *
  * Scale notes: exact dedup is one hash aggregate on the content hash.
  * Jaccard is shingle-join bounded (quadratic only within a shingle
  * bucket); MinHash+LSH replaces it at scale — candidates come from
  * band-bucket equality (a groupBy, not a cross join), so cost is
  * O(docs x bands) shuffle, independent of pair count.
  */
object DedupOps {

  import TextOps.{tokenHash, tokens, Mod}

  /** Exact duplicate groups by content hash: (h, keep_id, n_copies);
    * keeper = smallest doc_id (reference dedup keeps first-seen;
    * min is the deterministic distributed analogue). */
  def exactGroups(documents: DataFrame): DataFrame =
    documents.groupBy(md5(encode(col("text"), "UTF-8")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles per doc: (doc_id, shingle). */
  def shingles(documents: DataFrame, n: Int): DataFrame = {
    val toks = tokens(col("text"))
    val sh = when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "),
      ))).otherwise(array().cast("array<string>"))
    documents.select(col("doc_id"), explode(sh).as("shingle"))
  }

  /** Candidate near-duplicate pairs by n-gram Jaccard >= minJ:
    * (doc_a, doc_b, n_common, n_a, n_b, jaccard), doc_a < doc_b. */
  def jaccardPairs(documents: DataFrame, n: Int = 3, minJ: Double = 0.5): DataFrame = {
    // join on the 56-bit shingle hash: long equi-join beats string compare,
    // and the md5-derived hash is what the oracle uses anyway
    val sh = shingles(documents, n)
      .select(col("doc_id"), tokenHash(col("shingle")).as("shingle"))
      .cache()
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
  }

  /** MinHash signature columns sig0..sig{k-1} over word n-gram shingles.
    * Hash family: h_j(x) = ((2j+1) * (x mod M) + 12345j + 7) mod M over the
    * 56-bit md5 token hash. Computed with higher-order array functions —
    * one narrow pass, no explode, no shuffle. */
  def minhashSignatures(documents: DataFrame, n: Int = 3, k: Int = 16): DataFrame = {
    val toks = tokens(col("text"))
    val shingleArr = when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "),
      ))).otherwise(array(col("text")))  // short docs: whole text as shingle
    val hashes = transform(shingleArr, s => pmod(tokenHash(s), lit(Mod)))
    val sigCols = (0 until k).map { j =>
      val a = 2L * j + 1; val b = 12345L * j + 7
      array_min(transform(hashes, h => pmod(h * a + b, lit(Mod)))).as(s"sig$j")
    }
    documents.select((col("doc_id") +: sigCols): _*)
  }

  /** LSH band buckets: k signatures split into bands of r; bucket key =
    * band values joined. (doc_id, band, bucket). Candidate pairs are docs
    * sharing any (band, bucket). */
  def lshBuckets(documents: DataFrame, n: Int = 3, k: Int = 16, r: Int = 4): DataFrame = {
    val sigs = minhashSignatures(documents, n, k)
    val bands = (0 until k / r).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until r).map(j => col(s"sig${b * r + j}")): _*).as("bucket"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs from LSH buckets (doc_a < doc_b, distinct). */
  def lshCandidates(documents: DataFrame, n: Int = 3, k: Int = 16, r: Int = 4): DataFrame = {
    val b = lshBuckets(documents, n, k, r)
    b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** 16-bit SimHash over token hashes: bit b set iff the sum over tokens of
    * (+1 if bit b of hash(token) else -1) is positive. */
  def simhash(documents: DataFrame, bits: Int = 16): DataFrame = {
    val toks = tokens(col("text"))
    val hashes = transform(array_distinct(toks), t => tokenHash(t))
    val bitSum = (b: Int) =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
    val sim = (0 until bits).map(b =>
      when(bitSum(b) > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    documents.select(col("doc_id"), sim.as("simhash"))
  }
}
