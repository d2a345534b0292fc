package graft.multimodal

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** REAL video FRAME decode, hand-parsed from the RIFF/AVI spec, for
  * two codecs: BI_RGB 24-bit (biCompression = 0 — raw bottom-up DIB
  * frames, the standard uncompressed-AVI form, exact and codec-free)
  * and MJPG (each `00dc` chunk a standalone baseline JPEG, decoded by
  * the JDK's ImageIO — a real COMPRESSED codec, pure-JVM). Completes
  * the modality set: [[PixelDecode]] (image pixels), [[AudioPcm]]
  * (audio samples), and this (video frame pixels); inter-frame codecs
  * (H.264 etc.) stay stubbed as documented — no codec in this
  * environment.
  *
  * Frames are returned as binary PPMs of the decoded pixels (the
  * [[PixelDecode.thumbnail]] output convention: pure integer
  * encoding, no encoder variance), sampled at even stride with first
  * and last always included — the [[ImageHeaders.frames]] contract.
  *
  * Strictness: exact RIFF size, 'AVI ' form type, an `avih` header,
  * a video `strf` BITMAPINFOHEADER with planes=1/bpp=24/BI_RGB, a
  * `movi` list whose every `..db`/`..dc` chunk is exactly one padded
  * bottom-up BGR raster — text or foreign binary can never satisfy
  * it, so stub callers keep their oracle-exact fallback. */
object VideoFrames {

  final case class AviClip(width: Int, height: Int,
                           frames: Array[Array[Byte]]) // RGB top-down

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def fourCc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private val MJPG = 0x47504A4DL // "MJPG" as a little-endian fourcc

  /** Decode the raster of a standalone JPEG to top-down RGB triples
    * via the JDK decoder, or null when it doesn't decode to the
    * expected dimensions. RAW raster samples, not getRGB(): a
    * grayscale JPEG decodes to a LINEAR-gray BufferedImage whose
    * getRGB() applies a linear→sRGB transform — the raster sample IS
    * the decoded pixel value (and for DC-only uniform fixtures it is
    * decoder-invariant, see [[AviFixtures.jpegGrayUniform]]). */
  private def decodeJpegRgb(jpeg: Array[Byte], w: Int, h: Int): Array[Byte] =
    try {
      if (jpeg.length < 4 || (jpeg(0) & 0xFF) != 0xFF ||
          (jpeg(1) & 0xFF) != 0xD8) return null
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      if (img == null || img.getWidth != w || img.getHeight != h) return null
      val raster = img.getRaster
      val bands = raster.getNumBands
      if (bands != 1 && bands < 3) return null
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d = (y * w + x) * 3
          if (bands == 1) {
            val v = raster.getSample(x, y, 0).toByte
            rgb(d) = v; rgb(d + 1) = v; rgb(d + 2) = v
          } else {
            rgb(d) = raster.getSample(x, y, 0).toByte
            rgb(d + 1) = raster.getSample(x, y, 1).toByte
            rgb(d + 2) = raster.getSample(x, y, 2).toByte
          }
          x += 1
        }
        y += 1
      }
      rgb
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Decode an uncompressed-RGB or MJPEG AVI, or null for anything
    * else. Never throws. */
  def decode(b: Array[Byte]): AviClip = {
    if (b == null || b.length < 64 ||
        fourCc(b, 0) != "RIFF" || fourCc(b, 8) != "AVI ") return null
    if (u32(b, 4) + 8 != b.length) return null
    var w = 0; var h = 0; var ok = false; var mjpeg = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk chunks; LIST bodies recurse (hdrl for headers, movi for data).
    // Legitimate AVIs nest ≤ ~3 LIST levels (RIFF→hdrl→strl, RIFF→movi→rec);
    // a hostile blob can nest one level per 12 bytes, so bound the depth —
    // beyond it we reject rather than risk StackOverflowError (an Error no
    // caller catches), preserving the "never throws" contract.
    val maxDepth = 8
    def walk(from: Int, to: Int, depth: Int): Boolean = {
      if (depth > maxDepth) return false
      var i = from
      while (i + 8 <= to) {
        val id = fourCc(b, i)
        val len = u32(b, i + 4)
        if (len < 0 || i + 8 + len > to) return false
        val body = i + 8
        if (id == "LIST") {
          if (len < 4) return false
          if (!walk(body + 4, body + len.toInt, depth + 1)) return false
        } else if (id == "strf" && len >= 40 && u32(b, body) == 40L &&
            u16(b, body + 12) == 1 && u16(b, body + 14) == 24 &&
            (u32(b, body + 16) == 0L || u32(b, body + 16) == MJPG)) {
          // the video stream's BITMAPINFOHEADER: BI_RGB 24bpp (raw
          // bottom-up DIB frames) or MJPG (each frame a baseline JPEG)
          w = u32(b, body + 4).toInt; h = u32(b, body + 8).toInt
          if (w <= 0 || h <= 0 || w > 16384 || h > 16384) return false
          mjpeg = u32(b, body + 16) == MJPG
          ok = true
        } else if ((id.endsWith("db") || id.endsWith("dc")) &&
            id.take(2).forall(_.isDigit)) {
          if (!ok) return false // frames before the format header
          if (mjpeg) {
            val jpeg = java.util.Arrays.copyOfRange(b, body, body + len.toInt)
            val rgb = decodeJpegRgb(jpeg, w, h)
            if (rgb == null) return false // strictness: every frame decodes
            frames += rgb
          } else {
            val rowBytes = (w * 3 + 3) / 4 * 4
            if (len != rowBytes.toLong * h) return false
            val rgb = new Array[Byte](w * h * 3)
            var y = 0
            while (y < h) {
              val src = body + (h - 1 - y) * rowBytes // bottom-up BGR
              var x = 0
              while (x < w) {
                val s = src + x * 3; val d = (y * w + x) * 3
                rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s)
                x += 1
              }
              y += 1
            }
            frames += rgb
          }
        }
        i = body + len.toInt + (len.toInt & 1) // word alignment
      }
      true
    }
    if (!walk(12, b.length, 0)) return null
    if (!ok || frames.isEmpty) return null
    AviClip(w, h, frames.toArray)
  }

  private def toPpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** `n` evenly-strided frames as binary PPMs (first and last always
    * included when n > 1), or null when not an uncompressed-RGB AVI —
    * the call target of the codegen'd VideoFramesExpr. */
  def framesData(bytes: Array[Byte], n: Int): ArrayData = {
    if (n <= 0) return null
    val clip = decode(bytes)
    if (clip == null) return null
    val total = clip.frames.length
    val take = math.min(n, total)
    val out = new Array[Any](take)
    var j = 0
    while (j < take) {
      val idx = if (take == 1) 0
                else ((j.toLong * (total - 1)) / (take - 1)).toInt
      out(j) = toPpm(clip.width, clip.height, clip.frames(idx))
      j += 1
    }
    new GenericArrayData(out)
  }
}
