package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus the decode /
  * feature-extract / thumbnail / frame-sample operator shapes a
  * training-data pipeline needs.
  *
  * The Spark-side plumbing — schema, partitioning, per-partition batch
  * shape — is real and tested. PNG/JPEG metadata AND thumbnails are
  * REALLY decoded (javax.imageio ships with the JDK); WAV headers
  * really decode too, and MP4 headers decode via a pure-JVM ISO-BMFF
  * box walk ([[VideoHeaders]]). Only the codecs this environment lacks remain
  * STUBBED with a deterministic fake: every function marked "STUB
  * DECODER" derives its output from the bytes via hashing, standing in
  * for a real ffmpeg call with identical schema and batch shape.
  * Swapping in a real decoder touches only those marked lines.
  */
object Multimodal {

  case class AssetMeta(mime: String, width: Int, height: Int)
  case class Asset(asset_id: Long, content: Array[Byte], mime: String)
  case class DecodedAsset(asset_id: Long, mime: String, width: Int,
                          height: Int, n_bytes: Long)

  /** Shape a text corpus into a binary-asset table — the stand-in for
    * reading a real object-store asset manifest. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      to_binary(col("text"), lit("utf-8")).as("content"),
      concat(lit("application/x-fake-"), col("source")).as("mime"))

  /** Two planted REAL-image assets (the d12/s06 planted-fixture
    * pattern): a 64×48 24-bit BMP and a 40×30 binary PPM of the
    * [[PixelFixtures]] pinned pixel grid, at ids far above any
    * document id. The m01/m02 catalog queries union these in so the
    * REAL pixel decode path (hand-parsed uncompressed formats —
    * [[PixelDecode]]) is oracle-checked end-to-end: the DuckDB side
    * carries golden literals derived from the grid formula by an
    * independent implementation. */
  def pixelFixtureAssets(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (9000001L, PixelFixtures.bmp(64, 48), "image/bmp"),
      (9000002L, PixelFixtures.ppm(40, 30), "image/x-portable-pixmap"))
      .toDF("asset_id", "content", "mime")
  }

  /** Four planted WAV clips ([[WavFixtures]], pinned integer
    * waveforms) for the m05 sample-decode + feature-extraction row —
    * same planted-fixture discipline as [[pixelFixtureAssets]]. Two
    * are UNCOMPRESSED 16-bit PCM; two are IMA ADPCM, a real
    * compressed codec decoded bit-exactly in pure JVM integer math
    * ([[AudioPcm]]), with the fixture bytes and golden features
    * reproduced by the independent `tools/build_adpcm_fixture.py`. */
  def audioFixtureAssets(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (9000003L, WavFixtures.monoClip, "audio/wav"),
      (9000004L, WavFixtures.stereoClip, "audio/wav"),
      (9000007L, WavFixtures.adpcmMonoClip, "audio/wav"),
      (9000008L, WavFixtures.adpcmStereoClip, "audio/wav"))
      .toDF("asset_id", "content", "mime")
  }

  /** REAL audio feature extraction over binary content (hand-parsed
    * 16-bit PCM — [[AudioPcm]]): integer-exact energy / zero-crossing
    * / peak / windowed-energy bundle, NULL for non-audio bytes. */
  def audioFeatures(content: Column, windows: Int): Column =
    graft.functions.images.audio_features(content, windows)

  /** One planted uncompressed-RGB AVI clip ([[AviFixtures]], pinned
    * time-varying pixel grid) for m02's REAL video-frame row. */
  def videoFixtureAssets(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq((9000005L, AviFixtures.clip, "video/x-msvideo"),
        (9000006L, AviFixtures.mjpegClip, "video/x-msvideo"))
      .toDF("asset_id", "content", "mime")
  }

  /** Deterministic int in [0, 4 digits) from four hex chars of an
    * md5-hex column, combined via their code points. md5 (unlike
    * xxhash64) exists in DuckDB too, so every stub output derived this
    * way is fully oracle-checkable. */
  private def md5Num(md5Hex: Column, from: Int): Column =
    ascii(substring(md5Hex, from, 1)) * 1000 +
      ascii(substring(md5Hex, from + 1, 1)) * 100 +
      ascii(substring(md5Hex, from + 2, 1)) * 10 +
      ascii(substring(md5Hex, from + 3, 1))

  /** Metadata struct from the content bytes. PNG/JPEG content is
    * REALLY decoded (javax.imageio header probe via the codegen'd
    * [[graft.functions.images.image_meta]] expression — width/height/
    * mime from the actual header, pixel payload untouched); anything
    * else falls back to the deterministic md5 stub, which stands in
    * for the remaining codecs (this environment has no audio/video
    * libraries) and keeps the m01 oracle exact for text-derived
    * content — the PNG/JPEG magic bytes are invalid leading UTF-8, so
    * the two paths can never collide. Pure projection — runs in the
    * scan. */
  def decodeMeta(content: Column): Column = {
    val h = md5(content)
    val stub = struct(
      lit("image/fake").as("mime"),
      (pmod(md5Num(h, 1), lit(1920)) + 1).cast("int").as("width"),
      (pmod(md5Num(h, 5), lit(1080)) + 1).cast("int").as("height"))
    coalesce(graft.functions.images.image_meta(content), stub)
  }

  /** Audio metadata: WAV content REALLY decodes (javax.sound.sampled
    * header probe via the codegen'd audio_meta expression —
    * channels / sample rate / frames / duration from the actual RIFF
    * header); non-audio bytes yield NULL (unlike [[decodeMeta]] there
    * is no stub fallback — the catalog has no audio assets to keep
    * oracle-stable, so absence is the honest signal). */
  def decodeAudioMeta(content: Column): Column =
    graft.functions.images.audio_meta(content)

  /** Video metadata: MP4 content REALLY decodes (pure-JVM ISO-BMFF
    * moov/mvhd/tkhd box walk via the codegen'd video_meta expression —
    * width / height / duration / track count from the actual boxes, no
    * codec needed); non-MP4 bytes yield NULL, same contract as
    * [[decodeAudioMeta]]. Only frame PIXELS remain stubbed
    * ([[frameSample]]) — the codecs aren't available offline. */
  def decodeVideoMeta(content: Column): Column =
    graft.functions.images.video_meta(content)

  /** Thumbnail. PNG/JPEG content is REALLY decoded and resampled
    * (javax.imageio full decode + bilinear rescale via the codegen'd
    * [[graft.functions.images.image_thumbnail]] — longer edge ≤ `n`
    * pixels, PNG re-encoded); anything else keeps the deterministic
    * `n`-byte leading-window stub (STUB DECODER for the codecs this
    * environment lacks). The two paths can't collide: the image magic
    * bytes are invalid leading UTF-8, so text-derived assets always
    * take the stub — which is what keeps the m02 oracle exact. */
  def thumbnail(content: Column, n: Int): Column =
    coalesce(graft.functions.images.image_thumbnail(content, n),
      substring(content, 1, n))

  /** Frame sampling — array<binary>. GIF content REALLY decodes
    * (ImageIO sequence decode via the codegen'd
    * [[graft.functions.images.image_frames]] — ≤ `frames` evenly
    * strided frames, each re-encoded PNG); uncompressed-RGB AVI
    * content REALLY decodes to TRUE frame pixels with no codec at all
    * (hand-parsed RIFF/AVI — [[VideoFrames]], frames PPM-encoded);
    * anything else keeps the n fixed-stride byte windows (STUB
    * DECODER for the compressed-video codecs this environment lacks).
    * The GIF/RIFF magics are printable ASCII, but the full decodes
    * reject non-conforming structure, so text-derived assets always
    * take the stub — which keeps the m02 oracle exact. */
  def frameSample(content: Column, frames: Int, frameBytes: Int): Column =
    coalesce(
      graft.functions.images.image_frames(content, frames),
      graft.functions.images.video_frames(content, frames),
      transform(sequence(lit(0), lit(frames - 1)),
        i => content.substr(i * frameBytes + 1, lit(frameBytes))))

  /** STUB DECODER: fixed-width float feature vector from content —
    * stands in for a vision/audio embedding model. Deterministic:
    * feature j = scaled md5 of (content ++ j). Unrolled at the Scala
    * level (dim is a plan-time constant) so the projection stays in
    * whole-stage codegen — no interpreted array lambda. */
  def features(content: Column, dim: Int): Column =
    array(Seq.tabulate(dim) { j =>
      val h = md5(concat(content, lit(j.toString).cast("binary")))
      ((pmod(md5Num(h, 1), lit(2000)) - 1000) / lit(1000.0)).cast("float")
    }: _*)

  /** REAL content embedding — NOT a stub: dim-width L2-normalized
    * signed feature hashing over sliding byte n-grams
    * ([[FeatureHash]], surfaced as the codegen
    * `byte_ngram_features`). The real replacement for [[features]]
    * wherever oracle md5-portability isn't required: drives
    * content-level dedup and cosine similarity over binary assets
    * with no model weights, and keeps the exact operator shape
    * (binary → fixed-width float vector, row-local) a learned-model
    * swap-in would keep. */
  def featureEmbed(content: Column, dim: Int, n: Int = 8): Column =
    graft.functions.images.byte_ngram_features(content, dim, n)

  /** Batch decode through the typed per-partition path — the Scala
    * equivalent of a pandas-batch UDF stage: one decoder instance per
    * partition, rows streamed through it. PNG/JPEG content really
    * decodes ([[ImageHeaders]]); other content keeps the hash stub
    * (same schema/shape a real libav swap-in would keep). */
  def decodeBatched(assets: Dataset[Asset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init: a heavyweight codec (reader instances,
      // native contexts) would be opened once here
      it.map { a =>
        val real = ImageHeaders.meta(a.content)
        if (real != null)
          DecodedAsset(a.asset_id, real.mime, real.width, real.height,
            a.content.length.toLong)
        else {
          val h = java.util.Arrays.hashCode(a.content).toLong & 0x7fffffffL
          DecodedAsset(a.asset_id, a.mime,
            (h % 1920 + 1).toInt, ((h >> 8) % 1080 + 1).toInt,
            a.content.length.toLong)
        }
      }
    }
  }
}
