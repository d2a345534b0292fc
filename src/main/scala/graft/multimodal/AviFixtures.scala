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

  // ---- MJPEG fixture: a real COMPRESSED codec, decoder-invariant ----

  /** Frame f of the MJPEG clip is a UNIFORM grayscale of this value. */
  def mjpegGray(f: Int): Int = 32 + 21 * f

  // standard luminance Huffman tables (JPEG Annex K.3.1 / K.3.2)
  private val DcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcSymbols = Array.range(0, 12)
  private val AcCounts =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcSymbols = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  private def huffCodes(counts: Array[Int],
                        symbols: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (ln <- 1 to 16) {
      for (_ <- 0 until counts(ln - 1)) {
        out += symbols(k) -> (code, ln); code += 1; k += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Hand-encoded BASELINE JPEG of a uniform grayscale image — DC-only
    * blocks with Q(DC) = 8, so quantDC = V − 128 exactly and ANY
    * compliant decoder reproduces the flat value V bit-for-bit (no AC
    * terms, no chroma, no IDCT or upsampling variance — the property
    * that makes the MJPEG goldens decoder-invariant; the checked-in
    * fixture is byte-identical from the independent Python builder,
    * tools/build_mjpeg_fixture.py). Single grayscale component, the
    * standard Annex-K luminance Huffman tables. */
  def jpegGrayUniform(w: Int, h: Int, v: Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "dims must be 8-aligned")
    val dc = huffCodes(DcCounts, DcSymbols)
    val ac = huffCodes(AcCounts, AcSymbols)
    val buf = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(x => buf.write(x & 0xFF))
    def u16be(x: Int): Unit = { b(x >> 8, x) }
    b(0xFF, 0xD8)                                        // SOI
    b(0xFF, 0xE0); u16be(16); b('J', 'F', 'I', 'F', 0)
    b(1, 1, 0); u16be(1); u16be(1); b(0, 0)
    b(0xFF, 0xDB); u16be(67); b(0x00); (0 until 64).foreach(_ => b(8))
    b(0xFF, 0xC0); u16be(11); b(8); u16be(h); u16be(w)
    b(1, 0x01, 0x11, 0x00)
    b(0xFF, 0xC4); u16be(2 + 1 + 16 + DcSymbols.length); b(0x00)
    DcCounts.foreach(b(_)); DcSymbols.foreach(b(_))
    b(0xFF, 0xC4); u16be(2 + 1 + 16 + AcSymbols.length); b(0x10)
    AcCounts.foreach(b(_)); AcSymbols.foreach(b(_))
    b(0xFF, 0xDA); u16be(8); b(1, 0x01, 0x00); b(0, 63, 0)
    // entropy: block 0 carries DC diff V-128; the rest diff 0; all EOB
    var acc = 0L; var nbits = 0
    def put(code: Int, ln: Int): Unit = {
      acc = (acc << ln) | (code & ((1 << ln) - 1)); nbits += ln
      while (nbits >= 8) {
        val byte = ((acc >> (nbits - 8)) & 0xFF).toInt
        buf.write(byte)
        if (byte == 0xFF) buf.write(0x00)                // byte stuffing
        nbits -= 8; acc &= (1L << nbits) - 1
      }
    }
    val d = v - 128
    val nBlocks = (w / 8) * (h / 8)
    for (blk <- 0 until nBlocks) {
      val diff = if (blk == 0) d else 0
      val s = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, ln) = dc(s)
      put(code, ln)
      if (s > 0) put(if (diff > 0) diff else diff + (1 << s) - 1, s)
      val (eob, eln) = ac(0x00)
      put(eob, eln)
    }
    if (nbits > 0) { val pad = 8 - nbits; put((1 << pad) - 1, pad) }
    b(0xFF, 0xD9)                                        // EOI
    buf.toByteArray
  }

  /** Minimal canonical MJPEG AVI: same container as [[avi]] but the
    * stream fourcc / biCompression are 'MJPG' and each `00dc` chunk is
    * one standalone baseline JPEG (frame f = uniform [[mjpegGray]]). */
  def mjpegAvi(w: Int, h: Int, frames: Int): Array[Byte] = {
    val jpegs = (0 until frames).map(f => jpegGrayUniform(w, h, mjpegGray(f)))
    val movi = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val strl = 8 + 56 + 8 + 40
    val hdrl = 4 + 8 + 56 + 8 + 4 + strl
    val maxLen = jpegs.map(_.length).max
    val out = java.nio.ByteBuffer.allocate(12 + 8 + hdrl + 8 + movi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = { out.put(s.getBytes("US-ASCII")); () }
    cc("RIFF"); out.putInt(4 + 8 + hdrl + 8 + movi); cc("AVI ")
    cc("LIST"); out.putInt(hdrl); cc("hdrl")
    cc("avih"); out.putInt(56)
    out.putInt(100000)
      .putInt(maxLen * 10).putInt(0).putInt(0)
      .putInt(frames).putInt(0).putInt(1).putInt(maxLen)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); out.putInt(4 + strl); cc("strl")
    cc("strh"); out.putInt(56)
    cc("vids"); cc("MJPG")
    out.putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(10)
      .putInt(0).putInt(frames).putInt(maxLen).putInt(-1).putInt(0)
      .putShort(0.toShort).putShort(0.toShort)
      .putShort(w.toShort).putShort(h.toShort)
    cc("strf"); out.putInt(40)
    out.putInt(40).putInt(w).putInt(h)
      .putShort(1.toShort).putShort(24.toShort)
    cc("MJPG")                        // biCompression fourcc
    out.putInt(maxLen).putInt(0).putInt(0).putInt(0).putInt(0)
    cc("LIST"); out.putInt(movi); cc("movi")
    for (j <- jpegs) {
      cc("00dc"); out.putInt(j.length); out.put(j)
      if ((j.length & 1) == 1) out.put(0.toByte)
    }
    out.array()
  }

  /** The planted MJPEG clip: 16×8, 10 frames at 10 fps. */
  def mjpegClip: Array[Byte] = mjpegAvi(16, 8, 10)
}
