package graft.multimodal

/** REAL pixel-level decode for the uncompressed image formats that
  * need no codec at all — BMP (24-bit BI_RGB) and binary PPM (P6,
  * maxval 255) — hand-parsed from the public format specs, so the
  * pixel path is exact, deterministic across JDKs (no ImageIO
  * resampler variance), and independently reimplementable (the m01/m02
  * golden fixtures are verified against a second implementation).
  *
  * Both magics are printable ASCII, so a text document could pass the
  * sniff — the parse therefore demands full structural validity
  * INCLUDING an exact payload length, which no text-derived asset can
  * accidentally satisfy; failures return null and callers fall through
  * to their stub, keeping the m01/m02 oracles exact for text content.
  *
  * Decoded form: width, height, and row-major top-down RGB triples.
  */
object PixelDecode {

  /** Decoded pixels: row-major top-down, 3 bytes (R,G,B) per pixel. */
  final case class Pixels(width: Int, height: Int, rgb: Array[Byte])

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** Header + exact-payload-length validation only, no raster copy:
    * Array(width, height, pixelDataOffset, rowBytes), or null. All
    * size arithmetic is done in Long so a crafted header whose
    * w*h*3 wraps mod 2^32 cannot pass the length check. */
  private def bmpHeader(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    if (u32(b, 2) != b.length) return null              // exact file size
    val off = u32(b, 10).toInt
    if (u32(b, 14) != 40L) return null                  // BITMAPINFOHEADER
    val w = u32(b, 18).toInt; val h = u32(b, 22).toInt
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return null
    if (u16(b, 26) != 1 || u16(b, 28) != 24) return null // planes, bpp
    if (u32(b, 30) != 0L) return null                    // BI_RGB
    val rowBytes = (w * 3 + 3) / 4 * 4
    if (off < 54 || off.toLong + rowBytes.toLong * h != b.length) return null
    Array(w, h, off, rowBytes)
  }

  /** BMP: BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, 24 bpp,
    * BI_RGB (no compression), positive height (bottom-up rows, each
    * padded to 4 bytes, pixels stored BGR). Anything else → null. */
  def decodeBmp(b: Array[Byte]): Pixels = {
    val hdr = bmpHeader(b)
    if (hdr == null) return null
    val w = hdr(0); val h = hdr(1); val off = hdr(2); val rowBytes = hdr(3)
    // w*h*3 <= payload bytes <= b.length here, so Int math is safe.
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = off + (h - 1 - y) * rowBytes // bottom-up storage
      var x = 0
      while (x < w) {
        val s = src + x * 3; val d = (y * w + x) * 3
        rgb(d) = b(s + 2); rgb(d + 1) = b(s + 1); rgb(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Pixels(w, h, rgb)
  }

  /** Header + exact-payload-length validation only, no raster copy:
    * Array(width, height, rasterOffset), or null. The payload-length
    * comparison is done in Long — a crafted header like
    * "P6\n1048576 4096\n255\n" has w*h*3 ≡ 0 mod 2^32 and must NOT
    * pass by Int wraparound (text must never masquerade as an image). */
  private def ppmHeader(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 11 || b(0) != 'P' || b(1) != '6') return null
    var i = 2
    def skipWs(): Boolean = {
      var seen = false
      var more = true
      while (more && i < b.length) {
        val c = b(i)
        if (c == ' ' || c == '\n' || c == '\r' || c == '\t') {
          seen = true; i += 1
        } else if (c == '#') { // comment to end of line
          seen = true
          while (i < b.length && b(i) != '\n') i += 1
        } else more = false
      }
      seen
    }
    def int(): Int = {
      var v = -1
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (b(i) - '0')
        i += 1
        if (v > (1 << 20)) return -1
      }
      v
    }
    if (!skipWs()) return null
    val w = int(); if (w <= 0) return null
    if (!skipWs()) return null
    val h = int(); if (h <= 0) return null
    if (!skipWs()) return null
    if (int() != 255) return null
    // exactly one whitespace byte after maxval, then the raster
    if (i >= b.length) return null
    val c = b(i)
    if (c != ' ' && c != '\n' && c != '\r' && c != '\t') return null
    i += 1
    if ((b.length - i).toLong != w.toLong * h * 3) return null
    Array(w, h, i)
  }

  /** Binary PPM: "P6", whitespace-separated ASCII width / height /
    * maxval 255 ('#' comments allowed per spec), ONE whitespace byte,
    * then exactly width*height*3 raw RGB bytes. Anything else → null. */
  def decodePpm(b: Array[Byte]): Pixels = {
    val hdr = ppmHeader(b)
    if (hdr == null) return null
    val w = hdr(0); val h = hdr(1); val i = hdr(2)
    // w*h*3 == b.length - i (an Int) here, so Int math is safe.
    val rgb = new Array[Byte](w * h * 3)
    System.arraycopy(b, i, rgb, 0, rgb.length)
    Pixels(w, h, rgb)
  }

  def decode(b: Array[Byte]): Pixels = {
    val bmp = decodeBmp(b)
    if (bmp != null) bmp else decodePpm(b)
  }

  /** Metadata without copying the raster: both paths validate the
    * header and the exact payload length only — no pixels are
    * materialized, so m01-style meta queries decode each image once. */
  def meta(b: Array[Byte]): Multimodal.AssetMeta = {
    val bmp = bmpHeader(b)
    if (bmp != null) return Multimodal.AssetMeta("image/bmp", bmp(0), bmp(1))
    val ppm = ppmHeader(b)
    if (ppm == null) null
    else Multimodal.AssetMeta("image/x-portable-pixmap", ppm(0), ppm(1))
  }

  /** REAL pixel-touching thumbnail with a PINNED integer algorithm
    * (exactly reimplementable, unlike ImageIO's resampler): scale so
    * the longer edge is ≤ maxDim (never upscale), target
    * tw = max(1, round(w·scale)) / th likewise, and output pixel
    * (x, y) = the channel-wise mean — integer floor division by the
    * footprint size — over input rectangle
    * [floor(x·w/tw), floor((x+1)·w/tw)) × [floor(y·h/th), floor((y+1)·h/th)).
    * Encoded as binary PPM ("P6\nW H\n255\n" + raster): deterministic
    * bytes, decodable by this same object. Null if not BMP/PPM. */
  def thumbnail(b: Array[Byte], maxDim: Int): Array[Byte] = {
    if (maxDim <= 0) return null
    val p = decode(b)
    if (p == null) return null
    val scale = math.min(1.0, maxDim.toDouble / math.max(p.width, p.height))
    val tw = math.max(1, math.round(p.width * scale).toInt)
    val th = math.max(1, math.round(p.height * scale).toInt)
    val header = s"P6\n$tw $th\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + tw * th * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < th) {
      val y0 = y * p.height / th; val y1 = (y + 1) * p.height / th
      var x = 0
      while (x < tw) {
        val x0 = x * p.width / tw; val x1 = (x + 1) * p.width / tw
        var r = 0L; var g = 0L; var bl = 0L
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) {
            val s = (yy * p.width + xx) * 3
            r += p.rgb(s) & 0xFF; g += p.rgb(s + 1) & 0xFF
            bl += p.rgb(s + 2) & 0xFF
            xx += 1
          }
          yy += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        val d = header.length + (y * tw + x) * 3
        out(d) = (r / n).toByte; out(d + 1) = (g / n).toByte
        out(d + 2) = (bl / n).toByte
        x += 1
      }
      y += 1
    }
    out
  }
}
