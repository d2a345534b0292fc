// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the coercion/bridge APIs are private[sql]. Public API is
// graft.functions.images.audio_meta.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native expression for REAL audio header decode: struct(mime,
  * channels, sample_rate_hz, frames, duration_ms) for WAV content,
  * NULL for anything else — the audio sibling of [[ImageMeta]], same
  * eval/codegen-call-one-static-method construction
  * ([[graft.multimodal.AudioHeaders]]). */
case class AudioMetaExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = AudioMetaExpr.schema

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.AudioHeaders.metaRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.multimodal.AudioHeaders.metaRow($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioMetaExpr =
    copy(child = newChild)
}

object AudioMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate_hz", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Column API: real WAV header metadata, null otherwise. */
  def audioMeta(content: Column): Column =
    ExpressionUtils.column(AudioMetaExpr(ExpressionUtils.expression(content)))
}
