// Lives under org.apache.spark.sql for the same reason as VectorDot:
// the coercion/bridge APIs are private[sql]. Public API is
// graft.text.TextFunctions.{multisetStats, repetitionStats}.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass Gopher repetition statistics over whitespace-
  * normalized text — top-{2,3,4}-gram count/char-length, duplicated-
  * 5-gram characters, total characters — one tokenize, no per-gram
  * string allocation (grams are contiguous byte ranges of the
  * normalized text). Eval and codegen call the same static kernel
  * ([[graft.text.RepetitionKernel.repetitionStats]]) — the
  * ImageMeta/BpeEncodePiped construction — so the t23 projection stays
  * inside whole-stage codegen and the shared normalization subtree
  * stays subexpression-eliminated. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = RepetitionStats.schema

  override def nullSafeEval(v: Any): Any =
    graft.text.RepetitionKernel.repetitionStats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.text.RepetitionKernel.repetitionStats($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("top2_cnt", IntegerType, nullable = false),
    StructField("top2_len", IntegerType, nullable = false),
    StructField("top3_cnt", IntegerType, nullable = false),
    StructField("top3_len", IntegerType, nullable = false),
    StructField("top4_cnt", IntegerType, nullable = false),
    StructField("top4_len", IntegerType, nullable = false),
    StructField("dup5_chars", LongType, nullable = false),
    StructField("tot_chars", IntegerType, nullable = false)))

  def repetitionStats(normText: Column): Column =
    ExpressionUtils.column(
      RepetitionStats(ExpressionUtils.expression(normText)))
}

/** Native occurrence statistics of a string multiset (array<string>):
  * struct(n, n_distinct, top_cnt, top_len, dup_occ, dup_chars,
  * tot_chars). Replaces the interpreted sort_array +
  * aggregate-lambda formulation (CodegenFallback, per-element
  * interpreted struct state) with one sorted run scan in
  * [[graft.text.RepetitionKernel.multisetStats]]. */
case class StringMultisetStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = StringMultisetStats.schema

  override def nullSafeEval(v: Any): Any =
    graft.text.RepetitionKernel.multisetStats(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.text.RepetitionKernel.multisetStats($a);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): StringMultisetStats =
    copy(child = newChild)
}

object StringMultisetStats {
  val schema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_cnt", IntegerType, nullable = false),
    StructField("top_len", IntegerType, nullable = false),
    StructField("dup_occ", IntegerType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("tot_chars", LongType, nullable = false)))

  def multisetStats(arr: Column): Column =
    ExpressionUtils.column(
      StringMultisetStats(ExpressionUtils.expression(arr)))
}
