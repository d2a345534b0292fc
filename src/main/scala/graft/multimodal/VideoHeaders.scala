package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** REAL MP4 (ISO-BMFF) header decode — a pure-JVM box walk, no codec:
  * width / height / duration / track count straight from the
  * `moov`/`mvhd`/`tkhd` boxes (ISO/IEC 14496-12 §8.2.2, §8.3.2), the
  * video sibling of [[ImageHeaders]]/[[AudioHeaders]]. Frame PIXELS
  * still need a codec this environment lacks — only the metadata is
  * real here; [[Multimodal.frameSample]] keeps its labeled stub for
  * payload decode.
  *
  * Only bytes opening with a well-formed `ftyp` box (size ≥ 8 at
  * offset 0, magic "ftyp" at offset 4) enter the walk, and every read
  * is bounds-checked against the buffer, so text content can neither
  * false-positive nor crash: a parse that runs off the structure
  * returns null. Box sizes handle the 64-bit `largesize` form and the
  * size-0 "extends to EOF" form; `mvhd`/`tkhd` handle both version 0
  * (32-bit times) and version 1 (64-bit times) layouts. Width/height
  * come from the FIRST track whose `tkhd` carries a nonzero 16.16
  * fixed-point extent (audio/hint tracks store zero there, per spec),
  * duration from `mvhd` duration/timescale. */
object VideoHeaders {

  case class VideoMeta(mime: String, width: Int, height: Int,
                       durationMs: Long, nTracks: Int)

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def boxType(b: Array[Byte], off: Int): String =
    new String(b, off + 4, 4, "ISO-8859-1")

  /** (payloadStart, boxEnd) of the box at `off`, or null when the
    * header is malformed or overruns the buffer. */
  private def boxBounds(b: Array[Byte], off: Int,
                        limit: Int): (Int, Int) = {
    if (off + 8 > limit) return null
    val size = u32(b, off)
    val (payload, end) =
      if (size == 1) {
        if (off + 16 > limit) return null
        (off + 16, off + u64(b, off + 8))
      } else if (size == 0) (off + 8, limit.toLong)
      else (off + 8, off + size)
    if (end < payload || end > limit) null else (payload, end.toInt)
  }

  /** Walk the children of [start, end), invoking f(type, payloadStart,
    * boxEnd); stops at the first malformed header. */
  private def walk(b: Array[Byte], start: Int, end: Int)
                  (f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val bounds = boxBounds(b, off, end)
      if (bounds == null) return
      f(boxType(b, off), bounds._1, bounds._2)
      off = bounds._2
    }
  }

  /** Metadata, or null when the bytes are not a well-formed MP4.
    * Never throws. */
  def meta(bytes: Array[Byte]): VideoMeta = {
    if (bytes == null || bytes.length < 16) return null
    if (boxType(bytes, 0) != "ftyp" || boxBounds(bytes, 0, bytes.length) == null)
      return null
    try {
      var durationMs = -1L
      var width = 0; var height = 0; var nTracks = 0
      walk(bytes, 0, bytes.length) { (t, p, e) =>
        if (t == "moov") walk(bytes, p, e) { (t2, p2, e2) =>
          if (t2 == "mvhd" && e2 - p2 >= 20) {
            val v = bytes(p2) & 0xff
            // fullbox: version(1) flags(3), then v0 creation/
            // modification u32s or v1 u64s, then timescale u32,
            // duration (u32 v0 / u64 v1)
            val (ts, dur) =
              if (v == 1 && e2 - p2 >= 32)
                (u32(bytes, p2 + 20), u64(bytes, p2 + 24))
              else (u32(bytes, p2 + 12), u32(bytes, p2 + 16))
            if (ts > 0) durationMs = dur * 1000L / ts
          } else if (t2 == "trak") {
            nTracks += 1
            walk(bytes, p2, e2) { (t3, p3, e3) =>
              if (t3 == "tkhd" && width == 0) {
                val v = bytes(p3) & 0xff
                // width/height are the LAST 8 bytes of the box
                // (16.16 fixed) in both versions; payload is 84 bytes
                // (v0) / 96 (v1) per §8.3.2
                if (e3 - p3 >= (if (v == 1) 96 else 84)) {
                  val w = (u32(bytes, e3 - 8) >> 16).toInt
                  val h = (u32(bytes, e3 - 4) >> 16).toInt
                  if (w > 0 && h > 0) { width = w; height = h }
                }
              }
            }
          }
        }
      }
      if (nTracks == 0 && durationMs < 0) null
      else VideoMeta("video/mp4", width, height, durationMs, nTracks)
    } catch { case _: Exception => null }
  }

  /** [[meta]] as a Catalyst struct row — the call target of the
    * codegen'd VideoMetaExpr; null when not MP4. */
  def metaRow(bytes: Array[Byte]): InternalRow = {
    val m = meta(bytes)
    if (m == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.mime), m.width, m.height,
      m.durationMs, m.nTracks))
  }
}
