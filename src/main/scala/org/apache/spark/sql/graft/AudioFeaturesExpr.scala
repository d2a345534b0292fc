// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the coercion/bridge APIs are private[sql]. Public API is
// graft.functions.images.audio_features.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native expression for REAL audio sample decode + feature
  * extraction: struct(channels, sample_rate_hz, n_frames, energy,
  * zero_crossings, peak, window_energy) for 16-bit PCM WAV content,
  * NULL for anything else — every field integer-exact
  * ([[graft.multimodal.AudioPcm]]), so fixtures golden-check across
  * engines. Same eval/codegen-call-one-static-method construction as
  * [[AudioMetaExpr]]. */
case class AudioFeaturesExpr(child: Expression, windows: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = AudioFeaturesExpr.schema

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.AudioPcm.featuresRow(v.asInstanceOf[Array[Byte]], windows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.multimodal.AudioPcm.featuresRow($b, $windows);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioFeaturesExpr =
    copy(child = newChild)
}

object AudioFeaturesExpr {
  val schema: StructType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate_hz", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("window_energy", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** Column API: real PCM decode + integer-exact features, null for
    * non-WAV content. */
  def audioFeatures(content: Column, windows: Int): Column =
    ExpressionUtils.column(AudioFeaturesExpr(
      ExpressionUtils.expression(content), windows))
}
