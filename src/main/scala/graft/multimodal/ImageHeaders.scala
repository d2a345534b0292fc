package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** REAL image header decode (JDK javax.imageio — public and offline):
  * width/height/mime for PNG and JPEG byte content.
  *
  * Only bytes carrying the strict PNG (\\x89PNG\\r\\n\\x1a\\n) or JPEG
  * (\\xFF\\xD8\\xFF) magic are handed to ImageIO — both signatures are
  * invalid as leading UTF-8 text, so text-derived binary content can
  * never accidentally "decode" (the stub fallback path in
  * [[Multimodal.decodeMeta]] stays deterministic for it, which is what
  * keeps the m01 oracle exact). `getWidth(0)`/`getHeight(0)` read only
  * the header, not the pixel payload, so this is a metadata-speed
  * probe, not a full decode.
  *
  * Corpus-scale note: `ImageIO.getImageReaders` does a registry lookup
  * per call; a hot decode stage should hold a reader per partition
  * (that is what [[Multimodal.decodeBatched]]'s per-partition init slot
  * is for). For the header-sniff path the lookup is dwarfed by I/O.
  */
object ImageHeaders {

  private def isPng(b: Array[Byte]): Boolean =
    b.length > 24 &&
      (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 &&
      (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF

  /** (mime, width, height), or null when the bytes are not a
    * well-formed PNG/JPEG/BMP/PPM. Never throws. The uncompressed
    * formats go through the hand-rolled [[PixelDecode]] (no codec, no
    * ImageIO — exact and strictly validated, so text content still
    * falls through to the caller's stub). */
  def meta(bytes: Array[Byte]): Multimodal.AssetMeta = {
    val px = PixelDecode.meta(bytes)
    if (px != null) return px
    if (bytes == null || !(isPng(bytes) || isJpeg(bytes))) return null
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Multimodal.AssetMeta(
            if (isPng(bytes)) "image/png" else "image/jpeg",
            r.getWidth(0), r.getHeight(0))
        } finally r.dispose()
      } finally iis.close()
    } catch { case _: Exception => null }
  }

  /** REAL thumbnail: full PNG/JPEG decode (ImageIO), aspect-preserving
    * bilinear rescale so the longer edge is ≤ `maxDim` (never
    * upscales), re-encoded as PNG bytes. Null for non-image or
    * corrupted content — callers coalesce to their stub. Deterministic
    * for a given JDK: bilinear resampling and the PNG encoder are pure
    * functions of the pixel grid.
    *
    * Genuinely pixel-touching, like [[frames]] (header probes read no
    * payload); true-video frame extraction stays a stub — no mp4/webm
    * codec ships with the JDK, only GIF. */
  def thumbnail(bytes: Array[Byte], maxDim: Int): Array[Byte] = {
    // Uncompressed formats first: REAL pixels through the pinned
    // integer box-filter ([[PixelDecode.thumbnail]], PPM-encoded) —
    // deterministic across JDKs, golden-checkable in the m02 oracle.
    val px = PixelDecode.thumbnail(bytes, maxDim)
    if (px != null) return px
    if (bytes == null || maxDim <= 0 || !(isPng(bytes) || isJpeg(bytes)))
      return null
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return null
      val scale = math.min(1.0,
        maxDim.toDouble / math.max(img.getWidth, img.getHeight))
      val tw = math.max(1, math.round(img.getWidth * scale).toInt)
      val th = math.max(1, math.round(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      if (!ImageIO.write(out, "png", bos)) return null
      bos.toByteArray
    } catch { case _: Exception => null }
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length > 13 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** REAL frame sampling for multi-frame GIF content: ImageIO's GIF
    * reader decodes the image sequence; `n` frames are sampled at even
    * stride (first and last always included when n > 1), each
    * re-encoded as PNG bytes. Null for non-GIF or corrupted content —
    * callers coalesce to their byte-window stub, exactly like
    * [[thumbnail]]. GIF is the one multi-frame container the JDK ships
    * a codec for; a true video codec (libav) would slot into this same
    * shape. Frames are the stored rasters as the reader returns them —
    * disposal-method compositing of patch frames is out of scope (the
    * sampling/stride/re-encode plumbing is what this stage proves).
    *
    * Unlike PNG/JPEG magic, "GIF87a"/"GIF89a" is printable ASCII, so a
    * text document could pass the signature sniff — the full decode
    * then fails on the structure and returns null, keeping the stub
    * path (and the m02 oracle) intact for text-derived assets. */
  def frames(bytes: Array[Byte], n: Int): Array[Array[Byte]] = {
    if (bytes == null || n <= 0 || !isGif(bytes)) return null
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          val total = r.getNumImages(true)
          if (total <= 0) return null
          val take = math.min(n, total)
          val out = new Array[Array[Byte]](take)
          var j = 0
          while (j < take) {
            val idx =
              if (take == 1) 0
              else ((j.toLong * (total - 1)) / (take - 1)).toInt
            val img = r.read(idx)
            if (img == null) return null
            val bos = new java.io.ByteArrayOutputStream()
            if (!ImageIO.write(img, "png", bos)) return null
            out(j) = bos.toByteArray
            j += 1
          }
          out
        } finally r.dispose()
      } finally iis.close()
    } catch { case _: Exception => null }
  }

  /** [[frames]] as Catalyst array data — the call target of the
    * codegen'd ImageFrames expression; null when not a GIF. */
  def framesData(bytes: Array[Byte], n: Int): ArrayData = {
    val f = frames(bytes, n)
    if (f == null) null else new GenericArrayData(f.asInstanceOf[Array[Any]])
  }

  /** [[meta]] as a Catalyst struct row (mime, width, height) — the
    * call target of the codegen'd ImageMeta expression; null when not
    * an image. */
  def metaRow(bytes: Array[Byte]): InternalRow = {
    val m = meta(bytes)
    if (m == null) null
    else new GenericInternalRow(
      Array[Any](UTF8String.fromString(m.mime), m.width, m.height))
  }
}
