package graft.multimodal

/** Deterministic uncompressed-RGB AVI fixture (the video sibling of
  * [[PixelFixtures]]/[[WavFixtures]]): a pinned time-varying pixel
  * grid — frame f's pixel (x, y) has
  * R = (3x + 5y + 7f) mod 256, G = (11x + f) mod 256,
  * B = (13y + 2f) mod 256 — so sampled-frame PPMs and their hashes
  * are computable by any independent implementation. */
object AviFixtures {

  def r(x: Int, y: Int, f: Int): Int = (3 * x + 5 * y + 7 * f) % 256
  def g(x: Int, y: Int, f: Int): Int = (11 * x + f) % 256
  def b(x: Int, y: Int, f: Int): Int = (13 * y + 2 * f) % 256

  /** Minimal canonical uncompressed AVI: RIFF('AVI ' LIST(hdrl avih
    * LIST(strl strh strf)) LIST(movi 00db×frames)). BI_RGB 24-bit,
    * bottom-up padded rows, BGR — the DIB frame format. */
  def avi(w: Int, h: Int, frames: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val frameLen = rowBytes * h
    val strl = 8 + 56 + 8 + 40                  // strh + strf chunks
    val hdrl = 4 + 8 + 56 + 8 + 4 + strl        // 'hdrl' avih LIST(strl)
    val movi = 4 + frames * (8 + frameLen)      // 'movi' + frame chunks
    val out = java.nio.ByteBuffer.allocate(12 + 8 + hdrl + 8 + movi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = { out.put(s.getBytes("US-ASCII")); () }
    cc("RIFF"); out.putInt(4 + 8 + hdrl + 8 + movi); cc("AVI ")
    cc("LIST"); out.putInt(hdrl); cc("hdrl")
    cc("avih"); out.putInt(56)
    out.putInt(100000)                // µs per frame (10 fps)
      .putInt(frameLen * 10).putInt(0).putInt(0)
      .putInt(frames).putInt(0).putInt(1).putInt(frameLen)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); out.putInt(4 + strl); cc("strl")
    cc("strh"); out.putInt(56)
    cc("vids"); cc("DIB ")
    out.putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(10)           // rate 10/1 fps
      .putInt(0).putInt(frames).putInt(frameLen).putInt(-1).putInt(0)
      .putShort(0.toShort).putShort(0.toShort)
      .putShort(w.toShort).putShort(h.toShort)
    cc("strf"); out.putInt(40)
    out.putInt(40).putInt(w).putInt(h)
      .putShort(1.toShort).putShort(24.toShort)
      .putInt(0)                      // BI_RGB
      .putInt(frameLen).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); out.putInt(movi); cc("movi")
    var f = 0
    while (f < frames) {
      cc("00db"); out.putInt(frameLen)
      var y = h - 1                   // bottom-up rows
      while (y >= 0) {
        var x = 0
        while (x < w) {
          out.put(b(x, y, f).toByte).put(g(x, y, f).toByte)
            .put(r(x, y, f).toByte)
          x += 1
        }
        var pad = rowBytes - w * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        y -= 1
      }
      f += 1
    }
    out.array()
  }

  /** The planted clip: 8×6, 10 frames at 10 fps. */
  def clip: Array[Byte] = avi(8, 6, 10)
}
