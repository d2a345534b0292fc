package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows matched to right rows of the same
  * key whose event time falls in `(leftTime - lookback, leftTime]` —
  * "what happened for this key in the last N minutes". One definition
  * serves both execution modes:
  *
  *  - Batch: Spark plans the equality key as the join key and the
  *    range as a post-condition — a hash/sort-merge join shuffled on
  *    the key, never a nested-loop (the key equality is what keeps
  *    this scalable; a pure range join without an equality key would
  *    need bucketized time, which [[graft.operators.AsOfJoin]]'s
  *    union-window trick or time-bucket double-joins cover).
  *  - Streaming: with BOTH inputs watermarked on their time columns,
  *    the range condition is exactly what Structured Streaming needs
  *    to bound join state — each side retains only rows within
  *    `lookback + watermark` of the stream head (spec-checked with
  *    MemoryStream sources).
  *
  * Column names must be disjoint across the two inputs (rename before
  * joining — the usual stream-stream-join discipline).
  */
object StreamJoin {

  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   lookback: Column, joinType: String = "inner"): DataFrame = {
    val dup = left.columns.intersect(right.columns)
    require(dup.isEmpty,
      s"column names must be disjoint across inputs, both have: ${dup.mkString(", ")}")
    left.join(right,
      col(leftKey) === col(rightKey) &&
        col(rightTime) <= col(leftTime) &&
        col(rightTime) > col(leftTime) - lookback,
      joinType)
  }
}
