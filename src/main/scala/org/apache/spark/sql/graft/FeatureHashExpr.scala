// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the coercion/bridge APIs are private[sql]. Public API is
// graft.functions.images.byte_ngram_features.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Row-local REAL content embedding: dim-width L2-normalized signed
  * feature hashing over sliding byte n-grams (kernel:
  * [[graft.multimodal.FeatureHash.embed]]; eval and codegen call the
  * same static method, so the projection stays inside whole-stage
  * codegen like the other graft kernels). */
case class ByteNgramFeatures(child: Expression, dim: Int, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(dim > 0, s"dim must be positive, got $dim")
  require(n > 0, s"n must be positive, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    graft.multimodal.FeatureHash.embed(v.asInstanceOf[Array[Byte]], dim, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"${ev.value} = graft.multimodal.FeatureHash.embed($b, $dim, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ByteNgramFeatures =
    copy(child = newChild)
}

object ByteNgramFeatures {
  def byteNgramFeatures(content: Column, dim: Int, n: Int): Column =
    ExpressionUtils.column(
      ByteNgramFeatures(ExpressionUtils.expression(content), dim, n))
}
