package graft.multimodal

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** REAL audio header decode (JDK javax.sound.sampled — public and
  * offline): channels / sample rate / frame count / duration for WAV
  * (RIFF) byte content — the audio sibling of [[ImageHeaders]].
  *
  * Only bytes carrying the strict RIFF/WAVE magic (`RIFF....WAVE`) are
  * handed to the sound API. "RIFF" is printable ASCII, so unlike the
  * PNG/JPEG signatures it COULD open a text document — the full
  * 12-byte check (both magics, 8 bytes apart) plus the format parse
  * inside a catch makes a false positive practically impossible and a
  * crash actually impossible. `getAudioFileFormat` reads only the
  * header chunks, not the sample payload — a metadata-speed probe.
  */
object AudioHeaders {

  case class AudioMeta(mime: String, channels: Int, sampleRateHz: Int,
                       frames: Long, durationMs: Long)

  private def isRiffWave(b: Array[Byte]): Boolean =
    b.length > 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Metadata, or null when the bytes are not a well-formed WAV.
    * Never throws. */
  def meta(bytes: Array[Byte]): AudioMeta = {
    if (bytes == null || !isRiffWave(bytes)) return null
    try {
      val ff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val fmt = ff.getFormat
      val frames = ff.getFrameLength.toLong
      val rate = fmt.getSampleRate
      if (rate <= 0 || fmt.getChannels <= 0) return null
      AudioMeta("audio/wav", fmt.getChannels, rate.toInt, frames,
        if (frames < 0) -1L else (frames * 1000.0 / rate).toLong)
    } catch { case _: Exception => null }
  }

  /** [[meta]] as a Catalyst struct row — the call target of the
    * codegen'd AudioMetaExpr expression; null when not WAV. */
  def metaRow(bytes: Array[Byte]): InternalRow = {
    val m = meta(bytes)
    if (m == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.mime), m.channels, m.sampleRateHz,
      m.frames, m.durationMs))
  }
}
