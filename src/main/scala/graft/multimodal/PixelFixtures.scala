package graft.multimodal

/** Deterministic uncompressed-image fixtures for the REAL pixel path
  * (m01/m02 planted rows, MultimodalDecodeSpec): the pixel grid is a
  * pinned formula — pixel (x, y) has
  * R = (5x + 3y) mod 256, G = (7x + 13) mod 256, B = (11y + 29) mod 256
  * — so the expected decode, thumbnail and hash values are computable
  * by ANY independent implementation (the DuckDB oracle carries
  * golden literals derived from this spec in Python, not from the
  * Scala code). */
object PixelFixtures {

  def r(x: Int, y: Int): Int = (5 * x + 3 * y) % 256
  def g(x: Int, y: Int): Int = (7 * x + 13) % 256
  def b(x: Int, y: Int): Int = (11 * y + 29) % 256

  /** 24-bit BI_RGB BMP of the fixture grid (bottom-up rows, 4-byte
    * row padding, BGR order — the format spec, not a choice). */
  def bmp(w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val size = 54 + rowBytes * h
    val out = new Array[Byte](size)
    def p16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def p32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, size); p32(10, 54)
    p32(14, 40); p32(18, w); p32(22, h)
    p16(26, 1); p16(28, 24); p32(30, 0)
    p32(34, rowBytes * h)
    var y = 0
    while (y < h) {
      val dst = 54 + (h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val d = dst + x * 3
        out(d) = b(x, y).toByte; out(d + 1) = g(x, y).toByte
        out(d + 2) = r(x, y).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Binary PPM (P6, maxval 255) of the fixture grid. */
  def ppm(w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = header.length + (y * w + x) * 3
        out(d) = r(x, y).toByte; out(d + 1) = g(x, y).toByte
        out(d + 2) = b(x, y).toByte
        x += 1
      }
      y += 1
    }
    out
  }
}
