package graft.functions

import org.apache.spark.sql.Column

/** Public column API over the native media expressions (implementation
  * under org.apache.spark.sql.graft — see the note there on why). */
object images {
  /** REAL PNG/JPEG header decode (javax.imageio): struct(mime, width,
    * height), NULL when the bytes are not a well-formed image. */
  def image_meta(content: Column): Column =
    org.apache.spark.sql.graft.ImageMeta.imageMeta(content)

  /** REAL WAV header decode (javax.sound.sampled): struct(mime,
    * channels, sample_rate_hz, frames, duration_ms), NULL when the
    * bytes are not well-formed WAV. */
  def audio_meta(content: Column): Column =
    org.apache.spark.sql.graft.AudioMetaExpr.audioMeta(content)

  /** REAL audio SAMPLE decode + feature extraction (hand-parsed 16-bit
    * PCM WAV — no codec): struct(channels, sample_rate_hz, n_frames,
    * energy, zero_crossings, peak, window_energy[windows]) — every
    * field integer-exact, NULL for non-PCM-WAV bytes. */
  def audio_features(content: Column, windows: Int): Column =
    org.apache.spark.sql.graft.AudioFeaturesExpr.audioFeatures(content, windows)

  /** REAL MP4 header decode (pure-JVM ISO-BMFF moov/mvhd/tkhd box
    * walk — no codec): struct(mime, width, height, duration_ms,
    * n_tracks), NULL when the bytes are not well-formed MP4. Frame
    * pixels still require a codec and stay stubbed. */
  def video_meta(content: Column): Column =
    org.apache.spark.sql.graft.VideoMetaExpr.videoMeta(content)

  /** REAL thumbnail (javax.imageio full decode + bilinear rescale,
    * longer edge ≤ maxDim, PNG re-encode), NULL when the bytes are
    * not a well-formed PNG/JPEG. */
  def image_thumbnail(content: Column, maxDim: Int): Column =
    org.apache.spark.sql.graft.ImageThumbnail.imageThumbnail(content, maxDim)

  /** REAL GIF frame sampling (javax.imageio sequence decode, even
    * stride, per-frame PNG re-encode): array<binary> of ≤ n frames,
    * NULL when the bytes are not a well-formed GIF. */
  def image_frames(content: Column, n: Int): Column =
    org.apache.spark.sql.graft.ImageFrames.imageFrames(content, n)

  /** REAL video frame pixels (hand-parsed uncompressed-RGB AVI — no
    * codec): ≤ n evenly-strided frames as binary PPMs of the true
    * pixels, NULL for non-AVI bytes. */
  def video_frames(content: Column, n: Int): Column =
    org.apache.spark.sql.graft.VideoFramesExpr.videoFrames(content, n)

  /** REAL content embedding: dim-width L2-normalized signed feature
    * hashing (the hashing trick) over sliding byte n-grams —
    * array<float>, row-local, codegen. Identical bytes ⇒ identical
    * vector; near-identical ⇒ high cosine; unrelated ⇒ near-
    * orthogonal. See [[graft.multimodal.FeatureHash]]. */
  def byte_ngram_features(content: Column, dim: Int, n: Int): Column =
    org.apache.spark.sql.graft.ByteNgramFeatures
      .byteNgramFeatures(content, dim, n)
}
