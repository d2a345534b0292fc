// See VectorDot.scala for why this lives under org.apache.spark.sql.
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.Column

/** SQL registration for the engine's column functions: exposes the
  * Scala operator library to `spark.sql` users under stable names.
  * Column-composition functions are registered by round-tripping the
  * argument expressions through the Column API — same trees as the
  * Scala surface, zero duplication.
  */
object GraftFunctions {

  private def asCol(e: Expression): Column = ExpressionUtils.column(e)

  /** Fully convert a Column tree (function nodes + embedded catalyst
    * leaves) to a resolved catalyst Expression using the session's
    * node converter — ExpressionUtils.expression alone leaves an
    * Unevaluable ColumnNode wrapper behind. */
  private def asExpr(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  private def register1(spark: SparkSession, name: String,
                        f: Column => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => asExpr(spark, f(asCol(exprs.head))), "scala_udf")

  private def register2(spark: SparkSession, name: String,
                        f: (Column, Column) => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => asExpr(spark, f(asCol(exprs(0)), asCol(exprs(1)))), "scala_udf")

  def registerAll(spark: SparkSession): Unit = {
    import graft.text.TextFunctions._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_first_common",
      exprs => SortedFirstCommon(exprs(0), exprs(1)), "scala_udf")
    register2(spark, "cosine_similarity", graft.similarity.Similarity.cosine)
    register1(spark, "token_count", tokenCount)
    register1(spark, "subword_count", subwordCount)
    register1(spark, "punct_ratio", punctRatio)
    register1(spark, "quality_score", t => qualityScore(t))
    register1(spark, "lang_id", langId)
    register1(spark, "doc_fingerprint", fingerprint)
    register1(spark, "simhash", graft.dedup.Dedup.simhashSignature)
    // fixed-parameter forms of the parameterized operators
    register1(spark, "lsh_bucket",
      v => asCol(VectorLshBucket(asExpr(spark, v), 8, 42L)))
    register1(spark, "md5_bucket", c => md5Bucket(c, 100))
    register1(spark, "hash_split", c => hashSplit(c))
    graft.functions.BottomKSketch.register(spark)
  }
}
