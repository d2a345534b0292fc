// See VectorDot.scala for why this lives under org.apache.spark.sql.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native merge-walk set operations over SORTED distinct-element
  * arrays — the per-pair hot loop of every set-similarity verify
  * (jaccard intersections in d02/j01 run once per candidate pair, and
  * candidate pairs outnumber documents by orders of magnitude on
  * near-dup-dense data).
  *
  * Spark's `array_intersect` builds a hash set per evaluation —
  * per-call allocation plus hashing per element. Both engine call
  * sites already hold their arrays sorted (`sort_array(collect_set)`
  * shingle hashes; rank-sorted token ids), so the intersection is a
  * linear allocation-free two-pointer walk, and it participates in
  * whole-stage codegen. Eval/codegen parity and equivalence with
  * `array_intersect` are spec-checked (SortedArraysSpec).
  *
  * Contract: both inputs sorted ascending, distinct elements, non-null
  * elements, same element type (int or long). Unsorted input silently
  * undercounts — these are engine-internal primitives, the public
  * operators guarantee the contract.
  */
private[graft] trait SortedMergeWalk extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(IntegerType), ArrayType(LongType)),
    TypeCollection(ArrayType(IntegerType), ArrayType(LongType)))

  protected def elemIsLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else if (left.dataType.asInstanceOf[ArrayType].elementType !=
             right.dataType.asInstanceOf[ArrayType].elementType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"element types must match: ${left.dataType} vs ${right.dataType}")
    else base
  }
}

/** Count of common elements of two sorted distinct arrays. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends SortedMergeWalk {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    val isLong = elemIsLong
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xi = if (isLong) x.getLong(i) else x.getInt(i).toLong
      val yj = if (isLong) y.getLong(j) else y.getInt(j).toLong
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val t = if (elemIsLong) "Long" else "Int"
      // fresh names: the same expression can appear several times in
      // one codegen method (e.g. a Filter and a Project in one stage);
      // fixed names are a "Redefinition of local variable" compile
      // error and a silent whole-stage interpretation fallback
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $x = (long) $a.get$t($i);
         |  long $y = (long) $b.get$t($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Smallest common element of two sorted distinct arrays; null when
  * the intersection is empty. Replaces
  * `array_min(array_intersect(a, b))` in the verify-once guards. */
case class SortedFirstCommon(left: Expression, right: Expression)
    extends SortedMergeWalk {

  override def dataType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    val isLong = elemIsLong
    var i = 0; var j = 0
    while (i < n && j < m) {
      val xi = if (isLong) x.getLong(i) else x.getInt(i).toLong
      val yj = if (isLong) y.getLong(j) else y.getInt(j).toLong
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else return if (isLong) xi else xi.toInt
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val t = if (elemIsLong) "Long" else "Int"
      val jt = if (elemIsLong) "long" else "int"
      // fresh names — see SortedIntersectSize.doGenCode
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0;
         |${ev.isNull} = true;
         |while ($i < $n && $j < $m) {
         |  $jt $x = $a.get$t($i);
         |  $jt $y = $b.get$t($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { ${ev.isNull} = false; ${ev.value} = $x; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedFirstCommon =
    copy(left = newLeft, right = newRight)
}

object SortedArrays {
  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sortedFirstCommon(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedFirstCommon(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
