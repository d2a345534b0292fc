// Lives under org.apache.spark.sql because the expression-building
// APIs it needs (AbstractDataType/TypeCollection for input-type
// coercion, ExpressionUtils for Expression<->Column) are private[sql].
// This is the established pattern for third-party native expressions;
// the public API is graft.functions.vector_dot.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dot product of two numeric
  * arrays — the hot loop of similarity search.
  *
  * The pure-`functions._` formulation (`aggregate(zip_with(...))`)
  * runs on interpreted higher-order lambdas: per-element virtual calls,
  * boxing, and a NamedLambdaVariable write per step. This expression
  * participates in whole-stage codegen via [[doGenCode]], compiling to
  * a tight primitive loop over the two `ArrayData` buffers — the
  * preference order is compose-builtins < native Expression < UDF, and
  * this is the middle tier done properly.
  *
  * Semantics match the fold it replaces bit-for-bit: elements widen to
  * double, products accumulate left-to-right (deterministic IEEE
  * sequence — oracle-comparable). Arrays must be equal-length with
  * non-null elements (embedding vectors); a length mismatch raises.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == y.numElements(),
      s"vector_dot: length mismatch $n vs ${y.numElements()}")
    val xf = elemType(left) == FloatType
    val yf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: the same expression can occur several times in one
      // codegen method (redefinition = compile error = silent
      // interpretation fallback for the whole stage)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getA = if (elemType(left) == FloatType)
        s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemType(right) == FloatType)
        s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vector_dot: length mismatch " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column API: codegen'd dot product. */
  def vectorDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
