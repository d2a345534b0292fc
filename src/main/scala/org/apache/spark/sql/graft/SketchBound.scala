// See VectorDot.scala for why this lives under org.apache.spark.sql.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** PROVABLE upper bound on |x ∩ y| from bottom-k sketches — the
  * in-bucket candidate prefilter of the containment join (the q16
  * trick from the cosine join, applied to sets).
  *
  * Inputs: `xsk`/`ysk` are the sketches — the k smallest elements of
  * each set under a MONOTONE order (here: the first k entries of the
  * rare-first-ranked sorted token array, compressed by the monotone
  * saturating pack in [[graft.dedup.Dedup.sketchPack]]), sorted
  * ascending, possibly with duplicates (saturation); `nx`/`ny` are
  * the TRUE set sizes. The classic KMV intersection bound:
  *
  *   let M = min over TRUNCATED sides of the sketch's last entry
  *           (+∞ when neither side is truncated, i.e. k ≥ n);
  *   every common element BELOW M appears in both sketches (a set
  *   element below its own sketch's max is by construction inside
  *   the sketch), so A = |{q ∈ xsk ∩ ysk : q < M}| (multiset merge
  *   count) bounds that part from above; elements at or above M
  *   number at most nx − cx on the x side (cx = #{q ∈ xsk : q < M})
  *   and ny − cy on the y side, so
  *
  *   |x ∩ y| ≤ A + min(nx − cx, ny − cy).
  *
  * Monotone-map compression keeps the bound sound: collisions only
  * ever OVERcount A (min-multiplicity merge), and saturation only
  * moves elements from the A term to the (larger) remainder term.
  * When both sets fit in the sketch (n ≤ k) the bound is EXACT.
  * Soundness and eval/codegen parity are property-tested in
  * SortedArraysSpec.
  *
  * Contract: sketches sorted ascending, non-negative int elements,
  * xsk.length = min(k, nx) (resp. y) for a shared k. Engine-internal:
  * the containment join guarantees the contract.
  */
case class SketchIntersectBound(first: Expression, second: Expression,
                                third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    ArrayType(IntegerType), IntegerType, ArrayType(IntegerType), IntegerType)

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, nxa: Any, b: Any, nya: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = nxa.asInstanceOf[Int]; val ny = nya.asInstanceOf[Int]
    val kx = x.numElements(); val ky = y.numElements()
    if (kx == 0 || ky == 0) return 0
    // M: +∞ (Int.MaxValue) unless a side is truncated; entries equal
    // to a saturated MaxValue fall to the remainder term — conservative.
    val xFull = kx >= nx; val yFull = ky >= ny
    val m: Int =
      if (xFull && yFull) Int.MaxValue
      else if (xFull) y.getInt(ky - 1)
      else if (yFull) x.getInt(kx - 1)
      else math.min(x.getInt(kx - 1), y.getInt(ky - 1))
    var cx = 0; while (cx < kx && x.getInt(cx) < m) cx += 1
    var cy = 0; while (cy < ky && y.getInt(cy) < m) cy += 1
    var i = 0; var j = 0; var common = 0
    while (i < cx && j < cy) {
      val xi = x.getInt(i); val yj = y.getInt(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { common += 1; i += 1; j += 1 }
    }
    val restX = math.max(0, nx - cx); val restY = math.max(0, ny - cy)
    common + math.min(restX, restY)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, nx, b, ny) => {
      // fresh names — see SortedIntersectSize.doGenCode
      val kx = ctx.freshName("kx"); val ky = ctx.freshName("ky")
      val m = ctx.freshName("m")
      val cx = ctx.freshName("cx"); val cy = ctx.freshName("cy")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val xf = ctx.freshName("xFull"); val yf = ctx.freshName("yFull")
      s"""
         |int $kx = $a.numElements(); int $ky = $b.numElements();
         |if ($kx == 0 || $ky == 0) { ${ev.value} = 0; } else {
         |  boolean $xf = $kx >= $nx; boolean $yf = $ky >= $ny;
         |  int $m;
         |  if ($xf && $yf) $m = Integer.MAX_VALUE;
         |  else if ($xf) $m = $b.getInt($ky - 1);
         |  else if ($yf) $m = $a.getInt($kx - 1);
         |  else $m = Math.min($a.getInt($kx - 1), $b.getInt($ky - 1));
         |  int $cx = 0; while ($cx < $kx && $a.getInt($cx) < $m) $cx++;
         |  int $cy = 0; while ($cy < $ky && $b.getInt($cy) < $m) $cy++;
         |  int $i = 0; int $j = 0; int $c = 0;
         |  while ($i < $cx && $j < $cy) {
         |    int $xi = $a.getInt($i); int $yj = $b.getInt($j);
         |    if ($xi < $yj) $i++;
         |    else if ($xi > $yj) $j++;
         |    else { $c++; $i++; $j++; }
         |  }
         |  int $rx = Math.max(0, $nx - $cx); int $ry = Math.max(0, $ny - $cy);
         |  ${ev.value} = $c + Math.min($rx, $ry);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): SketchIntersectBound =
    copy(first = f, second = s, third = t, fourth = q)
}

object SketchBound {
  def sketchIntersectBound(xsk: Column, nx: Column,
                           ysk: Column, ny: Column): Column =
    ExpressionUtils.column(SketchIntersectBound(
      ExpressionUtils.expression(xsk), ExpressionUtils.expression(nx),
      ExpressionUtils.expression(ysk), ExpressionUtils.expression(ny)))
}
