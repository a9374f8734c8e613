package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Doc

/** Multimodal column plumbing: media spans are opaque binary payloads with
  * typed metadata. The Spark-side machinery (schema, batched partition
  * processing, binary columns) is real and tested; the actual codec is a
  * clearly-marked deterministic STUB (`fakeDecode`) because no image/audio
  * libraries exist in this environment — swap `fakeDecode` for a real
  * decoder batch-wise in `mapPartitions` in production.
  */
object MultimodalOps {

  /** Media spans of a Doc corpus as rows:
    * (doc_id, kind, media_ref, offset, payload: binary).
    * Payload is the deterministic stand-in `unhex(md5(media_ref))`. */
  def mediaSpans(docs: Dataset[Doc]): DataFrame =
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") =!= "text")
      .select(
        col("doc_id"),
        col("s.kind").as("kind"),
        col("s.media_ref").as("media_ref"),
        col("s.offset").as("offset"),
        unhex(md5(encode(col("s.media_ref"), "UTF-8"))).as("payload"),
      )

  /** STUB decoder: "width"/"height" pulled from the payload's leading bytes
    * (a real decoder would parse the codec header here). Deterministic:
    * width = byte0, height = byte1, n_frames = byte2 (video) else 1. */
  def decodeMetadata(media: DataFrame): DataFrame = {
    // ??? real codec goes here — batch-wise in mapPartitions; the fake
    // reads header bytes so the plumbing (binary -> struct) is exercised.
    val b = (i: Int) => conv(substring(hex(col("payload")), i * 2 + 1, 2), 16, 10).cast("long")
    media.select(
      col("doc_id"), col("kind"), col("media_ref"), col("offset"),
      b(0).as("width"),
      b(1).as("height"),
      when(col("kind") === "video", b(2)).otherwise(lit(1L)).as("n_frames"),
      length(col("payload")).cast("long").as("n_bytes"),
    )
  }

  /** Deterministic frame sampling: every `stride`-th frame index up to
    * n_frames for spans of `kind` (video by default; images are a single
    * frame). */
  def sampleFrames(meta: DataFrame, stride: Int = 4, kind: String = "video"): DataFrame =
    meta.filter(col("kind") === kind)
      .select(col("doc_id"), col("media_ref"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))

  /** STUB feature extraction: a fixed-length integer feature vector derived
    * from payload bytes (stands in for an image-embedding UDF; the batch
    * shape — one vector per row, array column — is the real contract). */
  def extractFeatures(media: DataFrame, dim: Int = 4): DataFrame = {
    val feats = (0 until dim).map(i =>
      conv(substring(hex(col("payload")), i * 4 + 1, 4), 16, 10).cast("long"))
    media.select(col("doc_id"), col("media_ref"), array(feats: _*).as("features"))
  }
}
