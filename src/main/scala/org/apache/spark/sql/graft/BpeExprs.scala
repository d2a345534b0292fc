// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the coercion/bridge APIs are private[sql]. Public API is
// graft.text.Bpe.encodeKernel.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local BPE encode: normalization + the full rank-ordered merge
  * chain in one pass over the text (kernel:
  * [[graft.text.BpeKernel.encodePiped]]; eval and codegen call the
  * same static method). Bit-identical to the M-chained-StringReplace
  * formulation (spec-pinned) without its M intermediate copies of the
  * document. */
case class BpeEncodePiped(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  // Seq fields keep case-class equality STRUCTURAL, so two
  // independently built bpe_encode calls over the same input are
  // semanticEquals and subexpression elimination can share them
  // (Array fields would compare by reference and defeat it — the
  // exact cost this expression exists to avoid).
  // The kernel applies merges per WORD, which equals Bpe.encode's
  // whole-string replace chain only while no merge symbol can cross a
  // word boundary or collide with the '|' piping — make the documented
  // domain assumption a loud failure instead of a silent divergence.
  require(merges.forall { case (a, b) =>
      !a.contains(' ') && !b.contains(' ') &&
      !a.contains('|') && !b.contains('|')
    },
    "bpe_encode merge symbols must contain neither ' ' nor '|' — " +
    "per-word merging would silently diverge from the chained form")

  @transient private lazy val mergesA: Array[String] =
    merges.map(_._1).toArray
  @transient private lazy val mergesB: Array[String] =
    merges.map(_._2).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    graft.text.BpeKernel.encodePiped(
      v.asInstanceOf[UTF8String], mergesA, mergesB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ma = ctx.addReferenceObj("bpeMergesA", mergesA, "java.lang.String[]")
    val mb = ctx.addReferenceObj("bpeMergesB", mergesB, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.text.BpeKernel.encodePiped($t, $ma, $mb);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodePiped =
    copy(child = newChild)
}

object BpeExprs {
  def encodePiped(text: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeEncodePiped(
      ExpressionUtils.expression(text), merges))
}
