// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the coercion/bridge APIs are private[sql]. Public API is
// graft.functions.images.video_meta.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native expression for REAL MP4 header decode: struct(mime, width,
  * height, duration_ms, n_tracks) from the moov/mvhd/tkhd box walk,
  * NULL for anything else — the video sibling of [[ImageMeta]] /
  * [[AudioMetaExpr]], same eval/codegen-call-one-static-method
  * construction ([[graft.multimodal.VideoHeaders]]). */
case class VideoMetaExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = VideoMetaExpr.schema

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.VideoHeaders.metaRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.multimodal.VideoHeaders.metaRow($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VideoMetaExpr =
    copy(child = newChild)
}

object VideoMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false)))

  /** Column API: real MP4 header metadata, null otherwise. */
  def videoMeta(content: Column): Column =
    ExpressionUtils.column(VideoMetaExpr(ExpressionUtils.expression(content)))
}
