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
}
