// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the coercion/bridge APIs are private[sql]. Public API is
// graft.functions.images.image_meta.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native expression for REAL image header decode: returns a
  * struct(mime, width, height) for PNG/JPEG byte content, NULL for
  * anything else. The parse itself lives in
  * [[graft.multimodal.ImageHeaders]] (javax.imageio) — eval and
  * codegen both call the same static method, so parity is by
  * construction; codegen emits one direct call inside the stage (no
  * UDF wrapping, no serialization of the bytes out of the row).
  */
case class ImageMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = ImageMeta.schema

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.ImageHeaders.metaRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.multimodal.ImageHeaders.metaRow($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {
  val schema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Column API: real PNG/JPEG header metadata, null otherwise. */
  def imageMeta(content: Column): Column =
    ExpressionUtils.column(ImageMeta(ExpressionUtils.expression(content)))
}

/** Native expression for the REAL thumbnail: full PNG/JPEG decode +
  * aspect-preserving bilinear rescale to `maxDim` on the longer edge,
  * re-encoded as PNG bytes; NULL for non-image content. Same
  * eval/codegen-parity-by-construction shape as [[ImageMeta]]: both
  * paths call one static method ([[graft.multimodal.ImageHeaders
  * .thumbnail]]). `maxDim` is a plan-time constant — a per-row column
  * would defeat reader reuse in a real codec stage. */
case class ImageThumbnail(child: Expression, maxDim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.ImageHeaders.thumbnail(v.asInstanceOf[Array[Byte]], maxDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.multimodal.ImageHeaders.thumbnail($b, $maxDim);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageThumbnail =
    copy(child = newChild)
}

object ImageThumbnail {
  /** Column API: real PNG thumbnail bytes, null for non-image. */
  def imageThumbnail(content: Column, maxDim: Int): Column =
    ExpressionUtils.column(
      ImageThumbnail(ExpressionUtils.expression(content), maxDim))
}

/** Native expression for REAL multi-frame sampling: GIF content is
  * fully decoded (ImageIO image sequence), `n` frames sampled at even
  * stride and re-encoded as PNG bytes each; NULL for non-GIF content.
  * Same eval/codegen-parity-by-construction shape as the siblings —
  * one static call target ([[graft.multimodal.ImageHeaders.framesData]])
  * serves both paths. `n` is a plan-time constant, like
  * [[ImageThumbnail]]'s maxDim. */
case class ImageFrames(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.ImageHeaders.framesData(v.asInstanceOf[Array[Byte]], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.multimodal.ImageHeaders.framesData($b, $n);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ImageFrames =
    copy(child = newChild)
}

object ImageFrames {
  /** Column API: real GIF frame PNGs (≤ n, evenly strided), null for
    * non-GIF content. */
  def imageFrames(content: Column, n: Int): Column =
    ExpressionUtils.column(ImageFrames(ExpressionUtils.expression(content), n))
}

/** Native expression for REAL video frame decode: ≤ n evenly-strided
  * frames of an uncompressed-RGB AVI as binary PPMs of the TRUE
  * pixels ([[graft.multimodal.VideoFrames]] — codec-free by format),
  * NULL for anything else. Same construction as [[ImageFrames]]. */
case class VideoFramesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.VideoFrames.framesData(v.asInstanceOf[Array[Byte]], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.multimodal.VideoFrames.framesData($b, $n);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VideoFramesExpr =
    copy(child = newChild)
}

object VideoFramesExpr {
  /** Column API: real uncompressed-AVI frame pixels as PPMs (≤ n,
    * evenly strided), null for non-AVI content. */
  def videoFrames(content: Column, n: Int): Column =
    ExpressionUtils.column(VideoFramesExpr(ExpressionUtils.expression(content), n))
}
