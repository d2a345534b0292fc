// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the coercion/bridge APIs are private[sql]. Public API is
// graft.functions.signatures.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local minhash signature: struct(shh sorted-distinct token
  * hashes, sig minhash slots) straight from the text — the whole
  * explode→hash→groupBy signature STAGE collapsed into one projection
  * expression (kernel: [[graft.dedup.SigHashes.minhashRow]]; eval and
  * codegen call the same static method). Bit-identical to the
  * aggregation path, zero shuffles. */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("shh", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    graft.dedup.SigHashes.minhashRow(v.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.dedup.SigHashes.minhashRow($t, $numHashes);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** Row-local packed SimHash (64-bit) — same collapse for the simhash
  * signature stage (kernel: [[graft.dedup.SigHashes.simhashPacked]]). */
case class SimhashPacked(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    graft.dedup.SigHashes.simhashPacked(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.dedup.SigHashes.simhashPacked($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashPacked =
    copy(child = newChild)
}

/** Row-local packed SimHash with the engine-PORTABLE md5-nibble token
  * hash (kernel: [[graft.dedup.SigHashes.simhashPackedMd5]]) — the
  * signature any md5-capable engine reproduces, at kernel speed. */
case class SimhashPackedMd5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    graft.dedup.SigHashes.simhashPackedMd5(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.dedup.SigHashes.simhashPackedMd5($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashPackedMd5 =
    copy(child = newChild)
}

object SignatureExprs {
  def minhashSignature(text: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinhashSignature(ExpressionUtils.expression(text), numHashes))

  def simhashPacked(text: Column): Column =
    ExpressionUtils.column(SimhashPacked(ExpressionUtils.expression(text)))

  def simhashPackedMd5(text: Column): Column =
    ExpressionUtils.column(SimhashPackedMd5(ExpressionUtils.expression(text)))
}
