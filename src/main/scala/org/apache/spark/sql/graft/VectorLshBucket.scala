// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the coercion/bridge APIs are private[sql]. Public API is
// graft.functions.vector_lsh_bucket.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for a random-hyperplane LSH bucket id:
  * bit p of the result is the sign of the vector's projection onto
  * pseudo-random hyperplane p, whose ±1 entries derive from a
  * splitmix64-style mix of (seed, plane, dim-index).
  *
  * Replaces the interpreted-HOF formulation
  * (`aggregate(zip_with(vec, sequence(...), ...))` per plane — a
  * per-row lambda interpreter in the hottest ANN path, the same
  * anti-pattern that cost 30-50× on minhash). This compiles to one
  * primitive loop over the vector with an unrolled-constant inner
  * plane loop — fully inside whole-stage codegen.
  *
  * The hash must be bit-identical between [[nullSafeEval]] and
  * [[doGenCode]]; both inline the same mix (spec-checked). Probe-side
  * parity needs no separate implementation: `Similarity.probeBuckets`
  * evaluates this same expression on the query literal.
  */
case class VectorLshBucket(child: Expression, numPlanes: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(numPlanes > 0 && numPlanes <= 62,
    s"numPlanes must be in [1, 62], got $numPlanes")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = LongType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val proj = new Array[Double](numPlanes)
    var i = 0
    while (i < n) {
      val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      var p = 0
      while (p < numPlanes) {
        var h = p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL + seed
        h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
        h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
        h = h ^ (h >>> 31)
        proj(p) += (if ((h & 1L) == 0L) xi else -xi)
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      bucket = bucket * 2L + (if (proj(p) >= 0.0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // fresh names — see VectorDot.doGenCode (fixed names collide when
      // the expression appears twice in one codegen method)
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val p = ctx.freshName("p")
      val h = ctx.freshName("h"); val bucket = ctx.freshName("bucket")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      val proj = ctx.freshName("proj")
      s"""
         |int $n = $v.numElements();
         |double[] $proj = new double[$numPlanes];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $get;
         |  for (int $p = 0; $p < $numPlanes; $p++) {
         |    long $h = (long) $p * 0x9E3779B97F4A7C15L
         |        + (long) $i * 0xC2B2AE3D27D4EB4FL + ${seed}L;
         |    $h = ($h ^ ($h >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $h = ($h ^ ($h >>> 27)) * 0x94D049BB133111EBL;
         |    $h = $h ^ ($h >>> 31);
         |    $proj[$p] += ((($h & 1L) == 0L) ? $x : -$x);
         |  }
         |}
         |long $bucket = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  $bucket = $bucket * 2L + (($proj[$p] >= 0.0) ? 1L : 0L);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorLshBucket =
    copy(child = newChild)
}

object VectorLshBucket {
  /** Column API: codegen'd hyperplane-LSH bucket id. */
  def vectorLshBucket(v: Column, numPlanes: Int, seed: Long): Column =
    ExpressionUtils.column(
      VectorLshBucket(ExpressionUtils.expression(v), numPlanes, seed))

  /** Driver-side twin of [[VectorLshBucket.nullSafeEval]] — same mix
    * constants, same accumulation order, bit-identical buckets
    * (parity is spec-checked in SimilarityIvfSpec). Lets a probe
    * compute its bucket without scheduling a Spark job per query. */
  def evalLocal(vec: Seq[Float], numPlanes: Int, seed: Long): Long = {
    require(numPlanes > 0 && numPlanes <= 62,
      s"numPlanes must be in [1, 62], got $numPlanes")
    val proj = new Array[Double](numPlanes)
    var i = 0
    while (i < vec.length) {
      val xi = vec(i).toDouble
      var p = 0
      while (p < numPlanes) {
        var h = p.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL + seed
        h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
        h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
        h = h ^ (h >>> 31)
        proj(p) += (if ((h & 1L) == 0L) xi else -xi)
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      bucket = bucket * 2L + (if (proj(p) >= 0.0) 1L else 0L)
      p += 1
    }
    bucket
  }
}
