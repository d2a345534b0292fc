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

  /** The two planted PCM clips: mono 8 kHz × 1600 frames, stereo
    * 16 kHz × 2048 frames. */
  def monoClip: Array[Byte] = wav(1, 8000, 1600, (f, _) => mono(f))
  def stereoClip: Array[Byte] =
    wav(2, 16000, 2048, (f, c) => if (c == 0) left(f) else right(f))

  // ---- IMA ADPCM (compressed) fixtures -------------------------------

  /** Pinned integer waveforms for the ADPCM clips — gentler slopes
    * than the PCM sawtooths (ADPCM is differential), still exact:
    *  - adpcm mono:   x(i) = ((i·13) mod 2401) − 1200
    *  - adpcm stereo: L(i) = ((i·11) mod 1801) − 900,
    *                  R(i) = ((i·17) mod 1501) − 750. */
  def adpcmMono(i: Int): Int = (i * 13) % 2401 - 1200
  def adpcmLeft(i: Int): Int = (i * 11) % 1801 - 900
  def adpcmRight(i: Int): Int = (i * 17) % 1501 - 750

  /** The PINNED IMA ADPCM encoder (the fixture builder twin in
    * `tools/build_adpcm_fixture.py` implements the identical spec
    * independently): per block per channel a 4-byte header carrying
    * the block's first input sample verbatim plus the carried step
    * index; every later sample quantized by the standard IMA
    * quantizer against the running predictor, which is then updated
    * with the DECODER's own rule ([[AudioPcm.adpcmStep]]) so encoder
    * and decoder state never diverge. Nibbles pack low-first into
    * 4-byte groups round-robin across channels. */
  def adpcmWav(channels: Int, rateHz: Int, blockAlign: Int,
               nBlocks: Int, sample: (Int, Int) => Int): Array[Byte] = {
    val spb = (blockAlign - 4 * channels) * 2 / channels + 1
    val frames = nBlocks * spb
    val dataLen = nBlocks * blockAlign
    val out = new Array[Byte](12 + 28 + 12 + 8 + dataLen)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(out.length - 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(channels.toShort).putInt(rateHz)
      .putInt((rateHz.toLong * blockAlign / spb).toInt)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(spb.toShort)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(frames)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      var c = 0
      while (c < channels) {
        pred(c) = sample(blk * spb, c)
        bb.putShort(pred(c).toShort).put(idx(c).toByte).put(0.toByte)
        c += 1
      }
      val groups = (blockAlign - 4 * channels) / (4 * channels)
      var g = 0
      while (g < groups) {
        var cc = 0
        while (cc < channels) {
          var k = 0
          while (k < 4) {
            var byte = 0
            var nib = 0
            while (nib < 2) {
              val f = blk * spb + 1 + g * 8 + k * 2 + nib
              val step = AudioPcm.StepTable(idx(cc))
              var diff = sample(f, cc) - pred(cc)
              var delta = 0
              if (diff < 0) { delta = 8; diff = -diff }
              if (diff >= step) { delta |= 4; diff -= step }
              if (diff >= (step >> 1)) { delta |= 2; diff -= step >> 1 }
              if (diff >= (step >> 2)) delta |= 1
              val packed = AudioPcm.adpcmStep(delta, pred(cc), idx(cc))
              pred(cc) = (packed & 0xFFFFL).toShort.toInt
              idx(cc) = (packed >>> 32).toInt
              byte |= (delta & 0xF) << (4 * nib)
              nib += 1
            }
            bb.put(byte.toByte)
            k += 1
          }
          cc += 1
        }
        g += 1
      }
      blk += 1
    }
    out
  }

  /** The two planted COMPRESSED clips: IMA ADPCM mono 8 kHz
    * (4 × 505-sample blocks) and stereo 16 kHz (4 × 249-sample
    * blocks). */
  def adpcmMonoClip: Array[Byte] =
    adpcmWav(1, 8000, 256, 4, (f, _) => adpcmMono(f))
  def adpcmStereoClip: Array[Byte] =
    adpcmWav(2, 16000, 256, 4,
      (f, c) => if (c == 0) adpcmLeft(f) else adpcmRight(f))
}
