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
}
