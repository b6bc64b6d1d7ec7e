package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (brief extension surface). No media codecs exist in this
  * environment, so the DECODE step is a clearly-marked deterministic stub —
  * the Spark-side plumbing (schema, binary columns, partition-parallel
  * batch processing, feature-vector shape) is real and tested, and a
  * production deployment swaps `decodeStub` for a codec call with the same
  * signature.
  *
  * Scale posture: everything is per-row/per-partition — no shuffle. Decode
  * runs via mapPartitions so per-partition setup (codec init in real life)
  * amortizes across rows, the same batch shape a Pandas-UDF/Arrow path
  * gives PySpark users.
  */
object Media {

  /** Typed media row: kind in {image, audio, video}, opaque payload,
    * sidecar metadata.
    */
  case class MediaRow(
      media_id: Long,
      kind: String,
      bytes: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  case class MediaFeatures(media_id: Long, kind: String, feature: Array[Double])

  /** Payload-level metadata from the binary column alone — pure column
    * math: size, content hash, leading magic bytes (the standard
    * sniff-don't-trust-the-extension check).
    */
  def mediaMeta(df: DataFrame): DataFrame =
    df.select(
      col("media_id"),
      col("kind"),
      length(col("bytes")).cast("long").as("size_bytes"),
      sha2(col("bytes"), 256).as("content_sha"),
      hex(substring(col("bytes"), 1, 4)).as("magic_hex"))

  /** DECODE STUB — stands in for image/audio/video decoding (no codec libs
    * in this container). Computes a deterministic 16-bin byte histogram,
    * L1-normalized: a real per-payload feature with the exact shape (fixed-
    * width Array[Double]) a decoder + feature extractor would produce.
    * Replace the body (only) with e.g. JPEG decode + pooled activations.
    */
  def decodeStub(df: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    df.mapPartitions { rows =>
      // per-partition init would open the codec once here
      rows.map { r =>
        val hist = new Array[Double](16)
        var i = 0
        while (i < r.bytes.length) {
          hist((r.bytes(i) & 0xff) >> 4) += 1.0
          i += 1
        }
        val n = math.max(1.0, r.bytes.length.toDouble)
        MediaFeatures(r.media_id, r.kind, hist.map(_ / n))
      }
    }
  }

  /** Deterministic frame-sample offsets for video rows: n evenly-spaced
    * timestamps within [0, duration) — pure column math; the frame EXTRACT
    * at those offsets is decoder territory (see decodeStub).
    */
  def frameSampleOffsets(df: DataFrame, n: Int): DataFrame =
    df.filter(col("kind") === "video")
      .select(
        col("media_id"),
        transform(
          sequence(lit(0), lit(n - 1)),
          i => (col("duration_ms") * i / n).cast("long")).as("sample_offsets_ms"))

  /** Metadata-level resize: recompute target dimensions preserving aspect
    * ratio. The pixel work belongs to the decoder (stubbed here); the
    * metadata contract — what downstream consumers read — is real.
    */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame =
    df.select(
      col("media_id"),
      col("width"),
      col("height"),
      when(greatest(col("width"), col("height")) <= maxSide, col("width"))
        .otherwise((col("width") * maxSide / greatest(col("width"), col("height"))).cast("int"))
        .as("target_width"),
      when(greatest(col("width"), col("height")) <= maxSide, col("height"))
        .otherwise((col("height") * maxSide / greatest(col("width"), col("height"))).cast("int"))
        .as("target_height"))
}
