package graft.functions

import org.apache.spark.sql.Column

/** Public column API over the native sorted-array merge-walk
  * expressions (implementation under org.apache.spark.sql.graft).
  * Both require sorted, distinct-element int/long arrays — the form
  * the dedup operators already hold their sets in. */
object arrays {
  /** Count of common elements — allocation-free replacement for
    * `size(array_intersect(a, b))` on sorted arrays. */
  def sorted_intersect_size(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.SortedArrays.sortedIntersectSize(a, b)

  /** Smallest common element (null if disjoint) — replacement for
    * `array_min(array_intersect(a, b))` on sorted arrays. */
  def sorted_first_common(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.SortedArrays.sortedFirstCommon(a, b)

  /** Provable UPPER bound on |x ∩ y| from bottom-k sketches (the k
    * smallest elements under a shared monotone order, ascending) plus
    * the true set sizes — the in-bucket candidate prefilter of the
    * set-similarity joins. Exact when both sets fit their sketches;
    * never below the true intersection size (soundness
    * property-tested in SortedArraysSpec). */
  def sketch_intersect_bound(xsk: Column, nx: Column,
                             ysk: Column, ny: Column): Column =
    org.apache.spark.sql.graft.SketchBound.sketchIntersectBound(
      xsk, nx, ysk, ny)
}
