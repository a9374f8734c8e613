package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism strategy: embeddings are quantized to integer milli-units
  * before any reduction, so dot products and norms are exact longs —
  * identical regardless of summation order or engine. Cosine is computed
  * from those exact integers at the end (single double division).
  *
  * Scale: [[cosineTopK]] is the brute-force baseline (one narrow pass +
  * a top-k reduce — no shuffle of the corpus); [[lshTopK]] is the scale
  * path: sign-bucket the space, search only the query's bucket.
  */
object AnnOps {

  /** Quantized embedding: round(x * 1000) as long. */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1000).cast("long"))

  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  def normQ(a: Column): Column = dotQ(a, a)

  /** Exact quantized-cosine top-k neighbors of `queryVec` (excluding
    * `excludeId`): (vec_id, label, cosine), ordered by cosine desc then
    * vec_id. Brute force — the correctness baseline. The per-row cosine is
    * a single codegen'd Catalyst expression ([[graft.functions.QuantizedCosine]]):
    * one primitive loop per row inside WholeStageCodegen, no interpreted
    * HOFs on the hot path; the top-k is TakeOrderedAndProject (no global
    * sort materialization). */
  def cosineTopK(embeddings: DataFrame, queryVec: Seq[Double], excludeId: Long, k: Int): DataFrame = {
    val qq = queryVec.map(x => math.round(x * 1000))
    val qNorm = math.sqrt(qq.map(x => x.toDouble * x).sum)
    val cos = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.QuantizedCosine(
        org.apache.spark.sql.GraftColumnBridge.expression(col("embedding")),
        qq.toArray, qNorm))
    embeddings
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"), col("label"), round(cos, 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Sign-bit LSH bucket over the first `nBits` dimensions:
    * bucket = sum_{j<nBits} (e[j] > 0) << j. */
  def signBucket(emb: Column, nBits: Int = 8): Column =
    (0 until nBits).map { j =>
      when(element_at(emb, j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucket histogram: (bucket, n). */
  def bucketHistogram(embeddings: DataFrame, nBits: Int = 8): DataFrame =
    embeddings.select(signBucket(col("embedding"), nBits).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** LSH-accelerated top-k: restrict the brute-force search to the query's
    * sign bucket. Recall < 1 by design; at scale the candidate set is
    * corpus/2^nBits — the partition-pruned path. */
  def lshTopK(embeddings: DataFrame, queryVec: Seq[Double], excludeId: Long, k: Int,
      nBits: Int = 8): DataFrame = {
    val qBucket = (0 until nBits).map(j => if (queryVec(j) > 0) 1L << j else 0L).sum
    cosineTopK(embeddings.filter(signBucket(col("embedding"), nBits) === qBucket),
      queryVec, excludeId, k)
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member of the
    * dedup family: candidate pairs come from sign-bucket equality (one
    * groupBy, no all-pairs; same cap discipline as the MinHash LSH path:
    * buckets larger than `maxBucket` are skipped), then the exact quantized
    * cosine (codegen'd pairwise expression) filters at `minCos`.
    * (vec_a, vec_b, cosine), vec_a < vec_b. Scale: candidates are bounded
    * by corpus/2ⁿᵇⁱᵗˢ per bucket with the cap as the skew backstop; recall
    * misses near-dups straddling a sign boundary — the standard LSH trade,
    * tighten with multi-probe or more tables if needed. */
  def cosineNearDupPairs(embeddings: DataFrame, minCos: Double = 0.99,
      nBits: Int = 8, maxBucket: Int = 256): DataFrame = {
    val byBucket = embeddings
      .select(col("vec_id"), col("embedding"), signBucket(col("embedding"), nBits).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("vs"))
      .filter(size(col("vs")).between(2, maxBucket))
    val pairs = byBucket.select(explode(flatten(transform(col("vs"), (x, i) =>
      transform(slice(col("vs"), i + 2, size(col("vs"))),
        y => struct(x.getField("vec_id").as("vec_a"),
          y.getField("vec_id").as("vec_b"),
          x.getField("embedding").as("ea"),
          y.getField("embedding").as("eb")))))).as("p"))
    val cos = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.QuantizedCosinePair(
        org.apache.spark.sql.GraftColumnBridge.expression(col("p.ea")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("p.eb"))))
    pairs.select(col("p.vec_a").as("vec_a"), col("p.vec_b").as("vec_b"),
        round(cos, 6).as("cosine"))
      .filter(col("cosine") >= minCos)
  }

  /** Exact duplicate embeddings (quantized-equal vectors): one hash-agg on
    * the quantized-vector fingerprint, keeper = smallest vec_id.
    * `minCopies = 2` returns only true duplicate groups; 1 returns every
    * group (the auditable full histogram). */
  def exactVectorDups(embeddings: DataFrame, minCopies: Int = 2): DataFrame =
    embeddings.groupBy(md5(to_json(quantize(col("embedding")))).as("vh"))
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("keep_id"))
      .filter(col("n") >= minCopies)
}
