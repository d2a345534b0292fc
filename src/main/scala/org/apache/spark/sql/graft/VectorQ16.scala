// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the expression-building APIs are private[sql]. Public API:
// graft.functions.vectors.{vector_q16, q16_cosine}.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** int16 vector quantization for ERROR-BOUNDED candidate prefiltering
  * inside LSH buckets (the m04/d13 cross-join shuffle cut).
  *
  * Layout of the encoded blob (little-endian):
  * `[scale: float][l2norm: float][q: int16 × n]` where
  * `scale = max_i |v_i|` and `q_i = round(v_i / scale · 32767)`.
  *
  * The approximate cosine computed from two blobs ([[Q16Cosine]]) is
  * within `16 · maxAbs/len₂ / 65534` of the true cosine — for any
  * real vector the per-coordinate quantization error is ≤
  * `scale/65534`, the dot error is ≤ (‖v‖₁·s_w + ‖w‖₁·s_v)/65534, and
  * ‖v‖₁ ≤ √n·‖v‖₂ with n = 64 gives ≤ 2.5e-4 for unit vectors —
  * three orders of magnitude under the 0.01 margin callers subtract
  * from their threshold, so the prefilter provably never drops a pair
  * the exact verify would keep. */
case class VectorQ16Encode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = BinaryType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    VectorQ16Encode.encode(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = org.apache.spark.sql.graft.VectorQ16Encode" +
        s".encode($a, $isFloat);"
    })

  override protected def withNewChildInternal(newChild: Expression): VectorQ16Encode =
    copy(child = newChild)
}

object VectorQ16Encode {
  /** Kernel shared by eval and codegen (one tight loop — calling a
    * static method from generated code is the VectorDot pattern for
    * bodies too long to inline as strings). */
  def encode(v: ArrayData, isFloat: Boolean): Array[Byte] = {
    val n = v.numElements()
    var maxAbs = 0.0
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val ax = math.abs(x)
      if (ax > maxAbs) maxAbs = ax
      sumSq += x * x
      i += 1
    }
    val out = new Array[Byte](8 + 2 * n)
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(maxAbs.toFloat)
    bb.putFloat(math.sqrt(sumSq).toFloat)
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val q = if (maxAbs == 0.0) 0
              else math.round(x / maxAbs * 32767.0).toInt
      bb.putShort(q.toShort)
      i += 1
    }
    out
  }

  def vectorQ16(v: Column): Column =
    ExpressionUtils.column(VectorQ16Encode(ExpressionUtils.expression(v)))
}

/** Approximate cosine of two [[VectorQ16Encode]] blobs — an integer
  * dot product plus two multiplies; 0.0 when either norm is 0 (the
  * exact verify's convention). */
case class Q16Cosine(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, BinaryType)

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    Q16Cosine.cosine(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = org.apache.spark.sql.graft.Q16Cosine.cosine($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Q16Cosine =
    copy(left = newLeft, right = newRight)
}

object Q16Cosine {
  def cosine(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length,
      s"q16_cosine: blob length mismatch ${a.length} vs ${b.length}")
    val ba = java.nio.ByteBuffer.wrap(a)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val bb = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sa = ba.getFloat(0).toDouble; val na = ba.getFloat(4).toDouble
    val sb = bb.getFloat(0).toDouble; val nb = bb.getFloat(4).toDouble
    if (na == 0.0 || nb == 0.0) return 0.0
    val n = (a.length - 8) / 2
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += ba.getShort(8 + 2 * i).toLong * bb.getShort(8 + 2 * i).toLong
      i += 1
    }
    acc.toDouble * sa * sb / (32767.0 * 32767.0) / (na * nb)
  }

  def q16Cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(Q16Cosine(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
