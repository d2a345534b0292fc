package graft.multimodal

/** Deterministic 16-bit PCM WAV fixtures (the audio sibling of
  * [[PixelFixtures]]): pinned INTEGER waveforms, so every feature the
  * m05 oracle golden-checks is computable by any independent
  * implementation with no floating point anywhere —
  *  - mono:   x(i)   = ((i·37)  mod 4001) − 2000
  *  - stereo: L(i)   = ((i·53)  mod 3001) − 1500,
  *            R(i)   = ((i·29)  mod 2501) − 1250. */
object WavFixtures {

  def mono(i: Int): Int = (i * 37) % 4001 - 2000
  def left(i: Int): Int = (i * 53) % 3001 - 1500
  def right(i: Int): Int = (i * 29) % 2501 - 1250

  /** Minimal canonical WAV: RIFF + 16-byte PCM fmt + data. */
  def wav(channels: Int, rateHz: Int, frames: Int,
          sample: (Int, Int) => Int): Array[Byte] = {
    val dataLen = frames * channels * 2
    val out = new Array[Byte](44 + dataLen)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rateHz)
      .putInt(rateHz * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        bb.putShort(sample(f, c).toShort)
        c += 1
      }
      f += 1
    }
    out
  }

  /** The two planted clips: mono 8 kHz × 1600 frames, stereo
    * 16 kHz × 2048 frames. */
  def monoClip: Array[Byte] = wav(1, 8000, 1600, (f, _) => mono(f))
  def stereoClip: Array[Byte] =
    wav(2, 16000, 2048, (f, c) => if (c == 0) left(f) else right(f))
}
