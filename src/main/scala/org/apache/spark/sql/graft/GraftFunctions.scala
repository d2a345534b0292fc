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
  *
  * Two entry points share one builder list:
  *  - [[registerAll]] — imperative, on a live session (temp functions);
  *  - [[graft.GraftExtensions]] — declarative, via
  *    `spark.sql.extensions=graft.GraftExtensions`, the standard way a
  *    cluster ships a library's function surface to every session.
  */
object GraftFunctions {

  private def asCol(e: Expression): Column = ExpressionUtils.column(e)

  /** Fully convert a Column tree (function nodes + embedded catalyst
    * leaves) to a resolved catalyst Expression using the session's
    * node converter — ExpressionUtils.expression alone leaves an
    * Unevaluable ColumnNode wrapper behind. */
  private def asExpr(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** Column-composition builders resolve through the ACTIVE session at
    * analysis time (a session always exists when an expression is being
    * resolved) — this is what lets the same builder serve both the
    * temp-function path and session-less extension injection. */
  private def col1(f: Column => Column): Seq[Expression] => Expression =
    exprs => asExpr(SparkSession.active, f(asCol(exprs.head)))

  private def col2(f: (Column, Column) => Column): Seq[Expression] => Expression =
    exprs => asExpr(SparkSession.active, f(asCol(exprs(0)), asCol(exprs(1))))

  /** Every expression-level function: (name, builder). */
  def builders: Seq[(String, Seq[Expression] => Expression)] = {
    import graft.text.TextFunctions._
    Seq(
      "vector_dot" -> (exprs => VectorDot(exprs(0), exprs(1))),
      "sorted_intersect_size" ->
        (exprs => SortedIntersectSize(exprs(0), exprs(1))),
      "sorted_first_common" ->
        (exprs => SortedFirstCommon(exprs(0), exprs(1))),
      "cosine_similarity" -> col2(graft.similarity.Similarity.cosine),
      "token_count" -> col1(tokenCount),
      "subword_count" -> col1(subwordCount),
      "punct_ratio" -> col1(punctRatio),
      "quality_score" -> col1(t => qualityScore(t)),
      "lang_id" -> col1(langId),
      "doc_fingerprint" -> col1(fingerprint),
      "simhash" -> col1(graft.dedup.Dedup.simhashSignature),
      "image_meta" -> (exprs => ImageMeta(exprs.head)),
      "audio_meta" -> (exprs => AudioMetaExpr(exprs.head)),
      "image_thumbnail" -> (exprs => ImageThumbnail(exprs.head, 128)),
      "image_frames" -> (exprs => ImageFrames(exprs.head, 4)),
      // fixed-parameter forms of the parameterized operators
      "lsh_bucket" ->
        (exprs => VectorLshBucket(exprs.head, 8, 42L)),
      "md5_bucket" -> col1(c => md5Bucket(c, 100)),
      "hash_split" -> col1(c => hashSplit(c)),
      // bloom_might_contain(hash BIGINT, bits BINARY, k INT) — SQL
      // callers pass the built filter as a binary literal/param
      "bloom_might_contain" ->
        (exprs => BloomMightContain(exprs(0), exprs(1), exprs(2))),
      // A-ES weighted-sampling priority (see Mixture.weightedPriority)
      "weighted_priority" -> col2(graft.text.Mixture.weightedPriority),
      // single-pass BPE encode under the frozen default merge table
      // (graft.text.Bpe) — piped tokenization state out
      "bpe_encode" -> (exprs =>
        BpeEncodePiped(exprs.head, graft.text.Bpe.DefaultMerges)),
      // frozen quality-classifier margin in micro-units (exact BIGINT;
      // > 0 means predicted-good) for one already-bucketed token — SQL
      // callers compose per-doc sums; the per-doc form is
      // TextClassifier.marginMicro
      "quality_margin_weight" -> col1(h => org.apache.spark.sql
        .functions.element_at(org.apache.spark.sql.functions.array(
          graft.text.TextClassifier.DefaultWeightsMicro
            .map(org.apache.spark.sql.functions.lit): _*), h + 1)))
  }

  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }
    // typed Aggregator — session-level udf registration, not an
    // expression builder (absent from the extensions injection set)
    graft.functions.BottomKSketch.register(spark)
  }
}
