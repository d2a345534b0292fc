package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** REAL audio SAMPLE decode for the uncompressed format that needs no
  * codec: 16-bit PCM WAV, hand-parsed from the RIFF spec (the pixel
  * sibling is [[PixelDecode]]; [[AudioHeaders]] stays the
  * header-speed probe). Strict structural validation — exact RIFF
  * size, a PCM `fmt ` chunk, a `data` chunk whose byte count matches
  * whole frames — so text content can never masquerade as audio.
  *
  * On the decoded samples it computes the classic integer-exact audio
  * features a curation pipeline gates on (clipping / silence /
  * energy-profile checks): total energy Σx², per-channel zero
  * crossings, peak amplitude, and an equal-split windowed energy
  * profile — every one an exact BIGINT/INT, so golden fixtures are
  * reproducible by any independent implementation, bit-for-bit.
  */
object AudioPcm {

  /** Decoded clip: interleaved 16-bit samples. */
  final case class Pcm(channels: Int, sampleRateHz: Int,
                       samples: Array[Short])

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** 16-bit PCM WAV → samples, or null for anything else (other bit
    * depths, compressed formats, malformed/truncated chunks). Unknown
    * chunks are skipped per the RIFF spec. Never throws. */
  def decode(b: Array[Byte]): Pcm = {
    if (b == null || b.length < 44 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return null
    if (u32(b, 4) + 8 != b.length) return null // exact RIFF size
    var i = 12
    var channels = 0; var rate = 0; var fmtSeen = false
    var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = u32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) return null
      if (id == "fmt ") {
        if (len < 16) return null
        if (u16(b, i + 8) != 1) return null       // PCM only
        channels = u16(b, i + 10)
        rate = u32(b, i + 12).toInt
        if (u16(b, i + 22) != 16) return null     // 16-bit only
        fmtSeen = true
      } else if (id == "data") {
        dataOff = i + 8; dataLen = len.toInt
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (!fmtSeen || dataOff < 0 || channels <= 0 || channels > 8 ||
        rate <= 0) return null
    val bytesPerFrame = channels * 2
    if (dataLen % bytesPerFrame != 0) return null // whole frames only
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var j = 0
    while (j < n) {
      samples(j) = ((b(dataOff + 2 * j) & 0xFF) |
        (b(dataOff + 2 * j + 1) << 8)).toShort
      j += 1
    }
    Pcm(channels, rate, samples)
  }

  /** The feature bundle over a decoded clip, `windows` equal frame
    * splits for the energy profile (window w covers frames
    * [⌊w·n/W⌋, ⌊(w+1)·n/W⌋), energy summed across channels). Zero
    * crossings count per-channel sign transitions (negative ↔
    * non-negative) and sum over channels. */
  def featuresRow(bytes: Array[Byte], windows: Int): InternalRow = {
    val p = decode(bytes)
    if (p == null || windows <= 0) return null
    val nFrames = p.samples.length / p.channels
    var energy = 0L; var zc = 0L; var peak = 0
    var j = 0
    while (j < p.samples.length) {
      val x = p.samples(j).toInt
      energy += x.toLong * x
      if (math.abs(x) > peak) peak = math.abs(x)
      j += 1
    }
    var c = 0
    while (c < p.channels) {
      var f = 1
      while (f < nFrames) {
        val prev = p.samples((f - 1) * p.channels + c) < 0
        val cur = p.samples(f * p.channels + c) < 0
        if (prev != cur) zc += 1
        f += 1
      }
      c += 1
    }
    val we = new Array[Any](windows)
    var w = 0
    while (w < windows) {
      val f0 = (w.toLong * nFrames / windows).toInt
      val f1 = ((w + 1).toLong * nFrames / windows).toInt
      var acc = 0L
      var f = f0
      while (f < f1) {
        var cc = 0
        while (cc < p.channels) {
          val x = p.samples(f * p.channels + cc).toInt
          acc += x.toLong * x
          cc += 1
        }
        f += 1
      }
      we(w) = acc
      w += 1
    }
    new GenericInternalRow(Array[Any](
      p.channels, p.sampleRateHz, nFrames.toLong, energy, zc, peak,
      new GenericArrayData(we)))
  }
}
