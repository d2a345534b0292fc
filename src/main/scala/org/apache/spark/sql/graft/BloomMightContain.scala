// See VectorDot.scala for why this lives under org.apache.spark.sql.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._

/** Native Catalyst membership probe against a Bloom filter over 64-bit
  * hashes — the scan-side prefilter for joins whose build side is too
  * big to broadcast raw but tiny as bits (decontamination against a
  * many-benchmark gram set is the canonical case: tens of millions of
  * grams ≈ hundreds of MB of strings but ~16 MB of bloom at 1% fpp).
  *
  * Probe scheme is double hashing from the one input hash (h2 forced
  * odd so the probe sequence cycles the full power-of-two bit space):
  * `idx_i = (h + i·h2) & (m-1)`, `h2 = (h >>> 33) | 1`. No second hash
  * pass per probe — the upstream `xxhash64` already mixed the key.
  *
  * The bits ship as a foldable BinaryType argument (a `lit(bytes)`),
  * so one array instance rides the plan into every task via the
  * codegen references table — not re-broadcast per row, and the
  * expression stays inside whole-stage codegen ([[doGenCode]] compiles
  * to a k-step bit-test loop).
  *
  * False positives are possible (callers re-verify with an exact join
  * on the survivors — see `Dedup.contaminationCountsBloom`); false
  * negatives are not (spec-pinned).
  */
case class BloomMightContain(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, BinaryType, IntegerType)

  override def dataType: DataType = BooleanType

  override def nullSafeEval(h: Any, bits: Any, k: Any): Any = {
    val b = bits.asInstanceOf[Array[Byte]]
    BloomMightContain.probe(h.asInstanceOf[Long], b, k.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, b, k) => {
      val h2 = ctx.freshName("h2")
      val mask = ctx.freshName("mask")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      s"""
         |long $h2 = ($h >>> 33) | 1L;
         |long $mask = (((long) $b.length) << 3) - 1L;
         |${ev.value} = true;
         |for (int $i = 0; $i < $k; $i++) {
         |  long $idx = ($h + (long) $i * $h2) & $mask;
         |  if (($b[(int) ($idx >>> 3)] & (1 << (int) ($idx & 7L))) == 0) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BloomMightContain {
  /** Shared probe kernel (interpreted eval + the bloom builder's set
    * path mirror it; codegen emits the same loop inline). */
  def probe(h: Long, bits: Array[Byte], k: Int): Boolean = {
    val h2 = (h >>> 33) | 1L
    val mask = (bits.length.toLong << 3) - 1L
    var i = 0
    while (i < k) {
      val idx = (h + i * h2) & mask
      if ((bits((idx >>> 3).toInt) & (1 << (idx & 7L).toInt)) == 0)
        return false
      i += 1
    }
    true
  }

  /** Set the k probe positions for hash `h` in `bits` (builder side —
    * must stay the exact dual of [[probe]]). */
  def set(h: Long, bits: Array[Byte], k: Int): Unit = {
    val h2 = (h >>> 33) | 1L
    val mask = (bits.length.toLong << 3) - 1L
    var i = 0
    while (i < k) {
      val idx = (h + i * h2) & mask
      val byteIdx = (idx >>> 3).toInt
      bits(byteIdx) = (bits(byteIdx) | (1 << (idx & 7L).toInt)).toByte
      i += 1
    }
  }

  def bloomMightContain(hash: Column, bits: Array[Byte], k: Int): Column = {
    require(bits.nonEmpty && (bits.length & (bits.length - 1)) == 0,
      s"bloom bit array length must be a power of two bytes, got ${bits.length}")
    ExpressionUtils.column(BloomMightContain(
      ExpressionUtils.expression(hash),
      ExpressionUtils.expression(lit(bits)),
      ExpressionUtils.expression(lit(k))))
  }
}
