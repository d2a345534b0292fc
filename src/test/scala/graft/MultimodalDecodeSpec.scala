package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{ImageHeaders, Multimodal}

/** The REAL image decode path: known-dimension PNG/JPEG fixtures
  * synthesized via the JDK, decoded through every surface —
  * the ImageHeaders helper, the codegen'd image_meta expression,
  * decodeMeta's real/stub dispatch, and the typed decodeBatched
  * stage. Non-image and corrupted content must fall back to the
  * deterministic stub (never throw), which is what keeps the m01
  * oracle exact for text-derived assets. */
class MultimodalDecodeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK can't encode $fmt")
    out.toByteArray
  }

  test("ImageHeaders: PNG/JPEG headers decode to true dimensions; junk is null") {
    val png = ImageHeaders.meta(imageBytes("png", 123, 45))
    assert(png == Multimodal.AssetMeta("image/png", 123, 45))
    val jpg = ImageHeaders.meta(imageBytes("jpg", 640, 480))
    assert(jpg == Multimodal.AssetMeta("image/jpeg", 640, 480))
    assert(ImageHeaders.meta("not an image".getBytes("UTF-8")) == null)
    assert(ImageHeaders.meta(Array[Byte]()) == null)
    // valid magic, corrupted body: must be null, not an exception
    val corrupt = imageBytes("png", 10, 10).take(12) ++ Array.fill(30)(0x7f.toByte)
    assert(ImageHeaders.meta(corrupt) == null)
  }

  test("decodeMeta: real decode for images, md5 stub for everything else") {
    val rows = Seq(
      (1L, imageBytes("png", 123, 45)),
      (2L, imageBytes("jpg", 640, 480)),
      (3L, "plain text content".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    val got = rows
      .select(col("asset_id"), Multimodal.decodeMeta(col("content")).as("m"))
      .select(col("asset_id"), col("m.mime"), col("m.width"), col("m.height"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L) == ("image/png", 123, 45))
    assert(got(2L) == ("image/jpeg", 640, 480))
    val (mime3, w3, h3) = got(3L)
    assert(mime3 == "image/fake" && w3 >= 1 && w3 <= 1920 && h3 >= 1 && h3 <= 1080)
  }

  test("image_meta participates in codegen and survives repeated use in one stage") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = Seq(
        (1L, imageBytes("png", 77, 33)),
        (2L, "text".getBytes("UTF-8"))).toDF("asset_id", "content")
      import graft.functions.images.image_meta
      val n = rows
        .filter(image_meta(col("content")).isNotNull ||
                length(col("content")) > 0)
        .select(image_meta(col("content")).as("m1"),
                image_meta(col("content")).as("m2"))
        .collect()
      assert(n.length == 2)
      assert(n.exists(r => !r.isNullAt(0) &&
        r.getStruct(0).getString(0) == "image/png" &&
        r.getStruct(0).getInt(1) == 77 && r.getStruct(0).getInt(2) == 33))
      assert(n.exists(r => r.isNullAt(0) && r.isNullAt(1)))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  private def wavBytes(sampleRateHz: Int, channels: Int,
                       frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRateHz.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    for (i <- pcm.indices) pcm(i) = ((i * 37) & 0x7f).toByte
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("AudioHeaders + audio_meta: WAV headers decode to true format; junk is null") {
    import graft.multimodal.AudioHeaders
    val m = AudioHeaders.meta(wavBytes(16000, 2, 8000))
    assert(m == AudioHeaders.AudioMeta("audio/wav", 2, 16000, 8000L, 500L))
    assert(AudioHeaders.meta("RIFFnot really a wave file".getBytes("UTF-8")) == null)
    assert(AudioHeaders.meta("plain text".getBytes("UTF-8")) == null)

    val rows = Seq(
      (1L, wavBytes(8000, 1, 4000)),
      (2L, "document body".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    import graft.functions.images.audio_meta
    val got = rows
      .select(col("asset_id"), audio_meta(col("content")).as("a"),
        audio_meta(col("content")).as("b")) // repeated use in one stage
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = got(1L).getStruct(1)
    assert(a.getString(0) == "audio/wav" && a.getInt(1) == 1 &&
      a.getInt(2) == 8000 && a.getLong(3) == 4000L && a.getLong(4) == 500L)
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(2))
  }

  // Minimal spec-correct ISO-BMFF: ftyp + moov(mvhd, trak(tkhd)…).
  // Built box-by-box from ISO/IEC 14496-12 §8.2.2/§8.3.2 — a REAL
  // format instance the box walk must parse, synthesized like the
  // PNG/WAV fixtures (no codec needed for headers).
  private def be32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ tpe.getBytes("ISO-8859-1") ++ payload
  private def mp4Bytes(timescale: Long, duration: Long,
                       tracks: Seq[(Int, Int)],
                       v1: Boolean = false): Array[Byte] = {
    val ver: Array[Byte] = Array((if (v1) 1 else 0).toByte, 0, 0, 0)
    val mvhd = box("mvhd",
      if (v1) ver ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(timescale) ++ be32(0) ++ be32(duration) ++
        Array.fill[Byte](80)(0)
      else ver ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        Array.fill[Byte](80)(0))
    val traks = tracks.map { case (w, h) =>
      // tkhd v0 payload: fullbox(4) c(4) m(4) id(4) res(4) dur(4)
      // res(8) layer/alt/vol/res(8) matrix(36) width(4) height(4) = 84
      // 84-byte payload: fullbox(4) + c/m/id/res/dur(20) + res(8) +
      // layer/alt/vol/res(8) + matrix(36) + width(4) + height(4)
      box("trak", box("tkhd",
        Array[Byte](0, 0, 0, 7) ++ Array.fill[Byte](72)(0) ++
          be32(w.toLong << 16) ++ be32(h.toLong << 16)))
    }
    box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0) ++
      "isommp42".getBytes("ISO-8859-1")) ++
      box("moov", (Seq(mvhd) ++ traks).flatten.toArray)
  }

  test("VideoHeaders + video_meta: MP4 moov/mvhd/tkhd boxes decode; junk is null") {
    import graft.multimodal.VideoHeaders
    // movie: 1000-unit timescale, 5500 units = 5.5 s; audio track
    // first (zero extent, per spec) then the 640x360 video track
    val mp4 = mp4Bytes(1000, 5500, Seq((0, 0), (640, 360)))
    val m = VideoHeaders.meta(mp4)
    assert(m == VideoHeaders.VideoMeta("video/mp4", 640, 360, 5500L, 2))
    // version-1 (64-bit times) layout decodes identically
    assert(VideoHeaders.meta(mp4Bytes(600, 1200, Seq((1920, 1080)), v1 = true))
      == VideoHeaders.VideoMeta("video/mp4", 1920, 1080, 2000L, 1))
    // not MP4 / truncated structure: null, never a throw
    assert(VideoHeaders.meta("plain text document".getBytes("UTF-8")) == null)
    assert(VideoHeaders.meta(mp4.take(20)) == null)
    assert(VideoHeaders.meta(Array[Byte]()) == null)
    // well-formed ftyp but a moov whose declared size overruns the
    // buffer: the walk stops at the malformed header
    val overrun = mp4.dropRight(40)
    assert(VideoHeaders.meta(overrun) == null ||
      VideoHeaders.meta(overrun).width == 0)

    val rows = Seq(
      (1L, mp4),
      (2L, "document body".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    import graft.functions.images.video_meta
    val got = rows
      .select(col("asset_id"), video_meta(col("content")).as("a"),
        video_meta(col("content")).as("b")) // repeated use in one stage
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = got(1L).getStruct(1)
    assert(a.getString(0) == "video/mp4" && a.getInt(1) == 640 &&
      a.getInt(2) == 360 && a.getLong(3) == 5500L && a.getInt(4) == 2)
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(2))
  }

  test("thumbnail: real resample for images (known-good dimensions), byte-window stub otherwise") {
    val rows = Seq(
      (1L, imageBytes("png", 64, 48)),   // downscale 2x → 32x24
      (2L, imageBytes("jpg", 30, 120)),  // portrait: longer edge caps → 8x32
      (3L, imageBytes("png", 10, 7)),    // already small: never upscaled
      (4L, "plain text that is definitely long enough".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    val got = rows
      .select(col("asset_id"), Multimodal.thumbnail(col("content"), 32).as("t"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

    def dims(b: Array[Byte]) = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(b))
      assert(img != null, "thumbnail is not a decodable image")
      (img.getWidth, img.getHeight)
    }
    assert(dims(got(1L)) == (32, 24))
    assert(dims(got(2L)) == (8, 32))
    assert(dims(got(3L)) == (10, 7))
    // non-image content: the deterministic 32-byte leading window
    assert(got(4L).toSeq ==
      "plain text that is definitely lo".getBytes("UTF-8").toSeq)
    // thumbnails are themselves valid PNG (re-encoded, not sliced)
    assert(ImageHeaders.meta(got(1L)) == Multimodal.AssetMeta("image/png", 32, 24))
    // deterministic: same input bytes → same thumbnail bytes
    val again = rows.filter(col("asset_id") === 1L)
      .select(Multimodal.thumbnail(col("content"), 32))
      .head().getAs[Array[Byte]](0)
    assert(again.toSeq == got(1L).toSeq)
  }

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    assert(in != null, s"missing checked-in fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("PixelDecode: checked-in BMP/PPM fixtures decode to TRUE pixels, no codec") {
    import graft.multimodal.{PixelDecode, PixelFixtures}
    // the files were produced by an INDEPENDENT implementation of the
    // pinned grid + format specs — agreeing pixels validate the parser
    // against externally produced bytes, not against itself
    val bmp = PixelDecode.decodeBmp(fixture("grid_64x48.bmp"))
    assert(bmp != null && bmp.width == 64 && bmp.height == 48)
    val ppm = PixelDecode.decodePpm(fixture("grid_40x30.ppm"))
    assert(ppm != null && ppm.width == 40 && ppm.height == 30)
    for ((p, w) <- Seq((bmp, 64), (ppm, 40)); y <- 0 until p.height;
         x <- 0 until w) {
      val i = (y * p.width + x) * 3
      assert((p.rgb(i) & 0xFF) == PixelFixtures.r(x, y) &&
        (p.rgb(i + 1) & 0xFF) == PixelFixtures.g(x, y) &&
        (p.rgb(i + 2) & 0xFF) == PixelFixtures.b(x, y),
        s"pixel ($x,$y) of ${p.width}x${p.height}")
    }
    // the Scala builders emit byte-identical files to the independent ones
    assert(PixelFixtures.bmp(64, 48).toSeq == fixture("grid_64x48.bmp").toSeq)
    assert(PixelFixtures.ppm(40, 30).toSeq == fixture("grid_40x30.ppm").toSeq)
    // strictness: text, truncated payloads, wrong bpp never "decode"
    assert(PixelDecode.decode("BM is how this text starts".getBytes) == null)
    assert(PixelDecode.decode("P6\n4 4\n255\nshort".getBytes) == null)
    assert(PixelDecode.decode(fixture("grid_64x48.bmp").dropRight(1)) == null)
    assert(PixelDecode.decode(fixture("grid_40x30.ppm") :+ 0x00.toByte) == null)
  }

  test("hostile headers never pass by Int wraparound or deep recursion") {
    import graft.multimodal.{PixelDecode, VideoFrames}
    // 1048576 * 4096 * 3 == 3 * 2^32 ≡ 0 mod 2^32: a zero-payload PPM
    // whose header passes an Int-arithmetic length check by wraparound.
    // It must NOT decode (and meta/thumbnail must not see an image).
    val wrap = "P6\n1048576 4096\n255\n".getBytes("US-ASCII")
    assert(PixelDecode.decodePpm(wrap) == null)
    assert(PixelDecode.meta(wrap) == null)
    assert(PixelDecode.thumbnail(wrap, 16) == null)
    // same trick with a few payload bytes (w*h*3 + k mod 2^32 == k)
    assert(PixelDecode.decodePpm(wrap ++ Array[Byte](1, 2, 3)) == null)

    // A RIFF/AVI blob nesting one LIST per 12 bytes: tens of thousands
    // of levels in ~240 KB. Unbounded recursion would StackOverflow
    // (an Error, killing the task); the walk must return null instead.
    val depth = 20000
    val total = 12 + 12 * depth
    val b = new Array[Byte](total)
    def put4(i: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, b, i, 4)
    def putLen(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    put4(0, "RIFF"); putLen(4, total - 8); put4(8, "AVI ")
    var off = 12
    var d = 0
    while (d < depth) {
      put4(off, "LIST"); putLen(off + 4, total - off - 8)
      put4(off + 8, "hdrl") // list type, then nested chunks follow
      off += 12; d += 1
    }
    assert(VideoFrames.decode(b) == null) // rejected, not thrown
  }

  test("uncompressed pixel path flows through meta/thumbnail plan surfaces") {
    import graft.multimodal.PixelDecode
    val rows = Seq(
      (1L, fixture("grid_64x48.bmp")),
      (2L, fixture("grid_40x30.ppm")),
      (3L, "plain text that is definitely long enough".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    val metas = rows.select(col("asset_id"),
        Multimodal.decodeMeta(col("content")).as("m"))
      .select(col("asset_id"), col("m.mime"), col("m.width"), col("m.height"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(metas(1L) == ("image/bmp", 64, 48))
    assert(metas(2L) == ("image/x-portable-pixmap", 40, 30))
    assert(metas(3L)._1 == "image/fake") // text keeps the stub

    val thumbs = rows.select(col("asset_id"),
        Multimodal.thumbnail(col("content"), 32).as("t"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // thumbnails are REAL pixels: decodable PPMs at the pinned dims,
    // and the top-left output pixel is the hand-computable box mean
    val t1 = PixelDecode.decodePpm(thumbs(1L))
    assert(t1 != null && t1.width == 32 && t1.height == 24)
    val t2 = PixelDecode.decodePpm(thumbs(2L))
    assert(t2 != null && t2.width == 32 && t2.height == 24)
    // bmp 64x48 → 2x2 blocks: mean of r(0,0),r(1,0),r(0,1),r(1,1)
    import graft.multimodal.PixelFixtures._
    val meanR = (r(0, 0) + r(1, 0) + r(0, 1) + r(1, 1)) / 4
    assert((t1.rgb(0) & 0xFF) == meanR)
  }

  test("AudioPcm: checked-in WAV fixtures decode to TRUE samples and exact features") {
    import graft.multimodal.{AudioPcm, WavFixtures}
    // files produced by an independent Python implementation of the
    // pinned waveforms + RIFF spec
    val monoBytes = fixture("clip_mono_8k.wav")
    val stereoBytes = fixture("clip_stereo_16k.wav")
    assert(WavFixtures.monoClip.toSeq == monoBytes.toSeq)
    assert(WavFixtures.stereoClip.toSeq == stereoBytes.toSeq)
    val m = AudioPcm.decode(monoBytes)
    assert(m != null && m.channels == 1 && m.sampleRateHz == 8000)
    assert(m.samples.length == 1600)
    for (i <- 0 until 1600)
      assert(m.samples(i) == WavFixtures.mono(i), s"sample $i")
    val s2 = AudioPcm.decode(stereoBytes)
    assert(s2 != null && s2.channels == 2 && s2.sampleRateHz == 16000)
    for (f <- 0 until 2048) {
      assert(s2.samples(2 * f) == WavFixtures.left(f))
      assert(s2.samples(2 * f + 1) == WavFixtures.right(f))
    }
    // strictness: javax-parsable junk, truncation, wrong depth → null
    assert(AudioPcm.decode("RIFF is how this text starts".getBytes) == null)
    assert(AudioPcm.decode(monoBytes.dropRight(1)) == null)
    assert(AudioPcm.decode(monoBytes :+ 0x00.toByte) == null)

    // plan surface: features are integer-exact, text assets are NULL
    val rows = Seq((1L, monoBytes), (2L, stereoBytes),
      (3L, "plain text that is definitely long enough".getBytes("UTF-8")))
      .toDF("asset_id", "content")
      .select(col("asset_id"),
        Multimodal.audioFeatures(col("content"), 4).as("f"))
    assert(rows.filter(col("f").isNull).select("asset_id")
      .head().getLong(0) == 3L)
    val got = rows.filter(col("f").isNotNull)
      .select(col("asset_id"), col("f.energy"), col("f.zero_crossings"),
        col("f.peak"), col("f.window_energy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getSeq[Long](4))).sortBy(_._1)
    // goldens from the independent Python implementation
    assert(got(0) == ((1L, 2107929559L, 29L, 2000,
      Seq(511084143L, 572063600L, 538722432L, 486059384L))))
    assert(got(1) == ((2L, 2605217128L, 119L, 1500,
      Seq(649997320L, 650991842L, 651821801L, 652406165L))))
  }

  test("AudioPcm: IMA ADPCM (compressed) decodes bit-exactly; fixture " +
      "bytes match the independent builder; junk is null") {
    import graft.multimodal.{AudioPcm, WavFixtures}
    val mono = WavFixtures.adpcmMonoClip
    val stereo = WavFixtures.adpcmStereoClip
    // byte-identical to tools/build_adpcm_fixture.py (independent
    // implementation of the pinned waveforms + encoder spec)
    def md5(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString
    assert(mono.length == 1084 &&
      md5(mono) == "a50d20e97ebf111aca1ef2d9a59919f2")
    assert(stereo.length == 1084 &&
      md5(stereo) == "b7f4d9f9bcbb0a0d6c7071a991d9e224")

    val m = AudioPcm.decode(mono)
    assert(m != null && m.channels == 1 && m.sampleRateHz == 8000 &&
      m.samples.length == 2020)
    // block headers carry the input sample verbatim: exact at every
    // block start; elsewhere the codec is lossy but bit-pinned
    for (blk <- 0 until 4)
      assert(m.samples(blk * 505) == WavFixtures.adpcmMono(blk * 505))
    val s2 = AudioPcm.decode(stereo)
    assert(s2 != null && s2.channels == 2 && s2.sampleRateHz == 16000 &&
      s2.samples.length == 996 * 2)

    // strictness: truncation, size drift, depth-4 PCM confusion → null
    assert(AudioPcm.decode(mono.dropRight(1)) == null)
    assert(AudioPcm.decode(mono :+ 0x00.toByte) == null)
    val badReserved = mono.clone()
    badReserved(12 + 28 + 12 + 8 + 3) = 1 // header reserved byte
    assert(AudioPcm.decode(badReserved) == null)
    // blockAlign whose data region is not whole 4-byte words per
    // channel (mono 6: spb=5 passes the consistency check but 2 tail
    // bytes per block would silently decode as zeros) → strict null
    assert(AudioPcm.decode(WavFixtures.adpcmWav(1, 8000, 6, 1,
      (f, _) => WavFixtures.adpcmMono(f))) == null)

    // feature goldens from the independent Python decoder
    val got = Seq((7L, mono), (8L, stereo)).toDF("asset_id", "content")
      .select(col("asset_id"),
        Multimodal.audioFeatures(col("content"), 4).as("f"))
      .select(col("asset_id"), col("f.n_frames"), col("f.energy"),
        col("f.zero_crossings"), col("f.peak"), col("f.window_energy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getSeq[Long](5))).sortBy(_._1)
    assert(got(0) == ((7L, 2020L, 930336102L, 21L, 1259,
      Seq(220669245L, 252484128L, 247402795L, 209779934L))))
    assert(got(1) == ((8L, 996L, 444316714L, 34L, 949,
      Seq(106832171L, 112784106L, 106563163L, 118137274L))))
  }

  test("VideoFrames: checked-in AVI decodes TRUE frame pixels; even stride; junk is null") {
    import graft.multimodal.{AviFixtures, PixelDecode, VideoFrames}
    val clip = fixture("clip_8x6.avi") // independent Python build
    assert(AviFixtures.clip.toSeq == clip.toSeq)
    val dec = VideoFrames.decode(clip)
    assert(dec != null && dec.width == 8 && dec.height == 6 &&
      dec.frames.length == 10)
    for (f <- 0 until 10; y <- 0 until 6; x <- 0 until 8) {
      val i = (y * 8 + x) * 3
      assert((dec.frames(f)(i) & 0xFF) == AviFixtures.r(x, y, f) &&
        (dec.frames(f)(i + 1) & 0xFF) == AviFixtures.g(x, y, f) &&
        (dec.frames(f)(i + 2) & 0xFF) == AviFixtures.b(x, y, f),
        s"frame $f pixel ($x,$y)")
    }
    // strictness: printable RIFF text, truncation, size drift → null
    assert(VideoFrames.decode("RIFF text that is not an avi".getBytes) == null)
    assert(VideoFrames.decode(clip.dropRight(1)) == null)
    assert(VideoFrames.decode(clip :+ 0x00.toByte) == null)

    // plan surface: frameSample takes the REAL path — 4 evenly-strided
    // frames (0/3/6/9) as PPMs decodable by PixelDecode
    val sampled = Seq((1L, clip)).toDF("asset_id", "content")
      .select(Multimodal.frameSample(col("content"), 4, 64).as("fr"))
      .head().getSeq[Array[Byte]](0)
    assert(sampled.length == 4)
    for ((bytes, j) <- sampled.zipWithIndex) {
      val f = Seq(0, 3, 6, 9)(j)
      val p = PixelDecode.decodePpm(bytes)
      assert(p != null && p.width == 8 && p.height == 6, s"sampled $j")
      assert((p.rgb(0) & 0xFF) == AviFixtures.r(0, 0, f),
        s"sampled $j is not frame $f")
    }
    // text content still takes the byte-window stub
    val stub = Seq((2L, "plain text that is definitely long enough x"
        .getBytes("UTF-8"))).toDF("asset_id", "content")
      .select(Multimodal.frameSample(col("content"), 4, 8).as("fr"))
      .head().getSeq[Array[Byte]](0)
    assert(stub.length == 4 && new String(stub.head, "UTF-8") == "plain te")
  }

  test("MJPEG AVI: real compressed-codec frame decode, decoder-invariant goldens") {
    import graft.multimodal.{AviFixtures, PixelDecode, VideoFrames}
    val clip = fixture("clip_mjpeg_16x8.avi") // independent Python build
    assert(AviFixtures.mjpegClip.toSeq == clip.toSeq,
      "Scala fixture builder diverged from the checked-in Python build")
    val dec = VideoFrames.decode(clip)
    assert(dec != null && dec.width == 16 && dec.height == 8 &&
      dec.frames.length == 10)
    // every frame is a DC-only uniform grayscale JPEG, so the decoded
    // raster is EXACTLY flat at the planted value on any compliant
    // decoder (no AC, no chroma, no IDCT/upsampling/gamma variance)
    for (f <- 0 until 10) {
      val exp = AviFixtures.mjpegGray(f)
      assert(dec.frames(f).forall(b => (b & 0xFF) == exp),
        s"frame $f not uniformly $exp")
    }
    // strictness: truncation, size drift, a corrupt JPEG chunk → null
    assert(VideoFrames.decode(clip.dropRight(1)) == null)
    assert(VideoFrames.decode(clip :+ 0x00.toByte) == null)
    val corrupt = clip.clone()
    val jpegAt = { // first 00dc payload start: corrupt its SOI marker
      val s = clip.indexOfSlice("00dc".getBytes("US-ASCII"))
      assert(s > 0); s + 8
    }
    corrupt(jpegAt) = 'A'.toByte
    assert(VideoFrames.decode(corrupt) == null)

    // plan surface: frameSample takes the REAL MJPEG path — 4 evenly-
    // strided frames (0/3/6/9) decoded to PPMs of the planted grays
    val sampled = Seq((1L, clip)).toDF("asset_id", "content")
      .select(Multimodal.frameSample(col("content"), 4, 64).as("fr"))
      .head().getSeq[Array[Byte]](0)
    assert(sampled.length == 4)
    for ((bytes, j) <- sampled.zipWithIndex) {
      val f = Seq(0, 3, 6, 9)(j)
      val p = PixelDecode.decodePpm(bytes)
      assert(p != null && p.width == 16 && p.height == 8, s"sampled $j")
      val exp = AviFixtures.mjpegGray(f)
      assert(p.rgb.forall(b => (b & 0xFF) == exp), s"sampled $j != gray $exp")
    }
  }

  /** Animated GIF with `n` solid-color frames (primary colors survive
    * GIF palettization exactly), via the JDK's GIF sequence writer. */
  private def gifBytes(w: Int, h: Int, n: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (i <- 0 until n) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(gifFrameRgb(i)))
        g.fillRect(0, 0, w, h)
        g.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  private def gifFrameRgb(i: Int): Int =
    Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFF00, 0x00FFFF, 0xFF00FF)(i % 6)

  test("ImageHeaders.frames: animated GIF really decodes; even stride; junk is null") {
    val gif = gifBytes(24, 16, 6)
    val got = ImageHeaders.frames(gif, 4)
    assert(got != null && got.length == 4)
    // each sampled frame is a valid PNG of the full logical size, and
    // the even stride over 6 frames at n=4 hits indices 0,1,3,5
    val expectIdx = Seq(0, 1, 3, 5)
    got.zip(expectIdx).foreach { case (b, idx) =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(b))
      assert(img != null && img.getWidth == 24 && img.getHeight == 16)
      assert((img.getRGB(3, 3) & 0xFFFFFF) == gifFrameRgb(idx),
        s"frame sampled at $idx has the wrong pixel content")
    }
    // n beyond the sequence: every stored frame, no padding
    assert(ImageHeaders.frames(gif, 99).length == 6)
    // single-frame ask: the first frame
    val one = ImageHeaders.frames(gif, 1)
    assert(one.length == 1 &&
      (ImageIO.read(new java.io.ByteArrayInputStream(one(0)))
        .getRGB(0, 0) & 0xFFFFFF) == gifFrameRgb(0))
    // GIF magic is printable ASCII — text with the magic must still be
    // rejected by the structural decode, and plain text by the sniff
    assert(ImageHeaders.frames("GIF89a but prose".getBytes("UTF-8"), 4) == null)
    assert(ImageHeaders.frames("plain text".getBytes("UTF-8"), 4) == null)
    assert(ImageHeaders.frames(gif.take(20).toArray, 4) == null)
  }

  test("frameSample: real GIF frames in the plan, byte-window stub otherwise") {
    val rows = Seq(
      (1L, gifBytes(20, 10, 5)),
      (2L, "plain text that is long enough for two byte windows".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    val got = rows
      .select(col("asset_id"),
        Multimodal.frameSample(col("content"), 3, 8).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Array[Byte]](1)).toMap
    // GIF: 3 evenly-strided frames (indices 0,2,4), each a real PNG
    assert(got(1L).length == 3)
    got(1L).zip(Seq(0, 2, 4)).foreach { case (b, idx) =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(b))
      assert(img != null && img.getWidth == 20 && img.getHeight == 10)
      assert((img.getRGB(1, 1) & 0xFFFFFF) == gifFrameRgb(idx))
    }
    // text: the deterministic fixed-stride byte windows
    assert(got(2L).length == 3)
    assert(got(2L).head.toSeq == "plain te".getBytes("UTF-8").toSeq)
    assert(got(2L)(1).toSeq == "xt that ".getBytes("UTF-8").toSeq)
    // SQL surface sees the same expression
    rows.createOrReplaceTempView("frame_assets")
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT size(image_frames(content)) FROM frame_assets WHERE asset_id = 1")
      .head().getInt(0)
    assert(viaSql == 4) // registry form samples 4; the 5-frame GIF has ≥ 4
  }

  test("decodeBatched: typed per-partition path really decodes images") {
    val assets = Seq(
      Multimodal.Asset(1L, imageBytes("png", 31, 64), "application/x-unknown"),
      Multimodal.Asset(2L, "some document".getBytes("UTF-8"), "text/plain"))
      .toDS()
    val out = Multimodal.decodeBatched(assets).collect()
      .map(d => d.asset_id -> d).toMap
    assert(out(1L).mime == "image/png" &&
      out(1L).width == 31 && out(1L).height == 64)
    assert(out(2L).mime == "text/plain" &&
      out(2L).width >= 1 && out(2L).width <= 1920)
  }
}
