package graft.functions

import org.apache.spark.sql.Column

/** Public column API over the engine's native Catalyst expressions
  * (implementation under org.apache.spark.sql.graft — see the note
  * there on why). */
object vectors {
  /** Whole-stage-codegen dot product of two numeric array columns. */
  def vector_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorDot.vectorDot(a, b)

  /** Whole-stage-codegen random-hyperplane LSH bucket id (bit p = sign
    * of projection onto pseudo-random plane p). */
  def vector_lsh_bucket(v: Column, numPlanes: Int, seed: Long): Column =
    org.apache.spark.sql.graft.VectorLshBucket.vectorLshBucket(v, numPlanes, seed)

  /** int16-quantized vector blob (scale + l2 norm + packed shorts) —
    * the error-bounded sketch bucket-local candidate prefilters carry
    * (≈4× narrower than the float vector). */
  def vector_q16(v: Column): Column =
    org.apache.spark.sql.graft.VectorQ16Encode.vectorQ16(v)

  /** Approximate cosine of two [[vector_q16]] blobs: within 2.5e-4 of
    * the true cosine for 64-dim vectors — prefilter at
    * (threshold − 0.01) and the exact verify keeps the decision. */
  def q16_cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Q16Cosine.q16Cosine(a, b)
}
