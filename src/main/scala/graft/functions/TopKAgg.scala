package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a mergeable typed `Aggregator`: keeps the k
  * largest (score, tag) pairs per group in a bounded buffer.
  *
  * This is the scale-correct form of "top N per group". The window
  * formulation (`row_number() over (partition by g order by s desc)
  * <= k`) SORTS every group's full row set after shuffling all of it;
  * this aggregator folds rows into a k-bounded buffer with map-side
  * partial aggregation — O(n log k) work, O(k) state, and only k rows
  * per group ever cross the shuffle. At 100 TB the difference is a
  * full-data shuffle+sort vs a shuffle of `groups × k` buffer rows.
  *
  * Merge is commutative/associative and ties break on (score DESC,
  * tag ASC), so the result is identical under any partitioning, input
  * order, or AQE re-plan — the same determinism discipline as
  * [[graft.functions.money]].
  *
  * Usage (typed):
  *   ds.groupByKey(_.category).agg(TopKAgg.of(3).toColumn)
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, String), List[(Long, String)],
                       Seq[(Long, String)]]
    with Serializable {
  require(k > 0, s"k must be positive, got $k")

  // descending by score, ascending by tag — a total order, so the
  // bounded buffer keeps a deterministic top-k under any merge order
  private def better(a: (Long, String), b: (Long, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  // buffer kept sorted best-first, length ≤ k; List keeps the encoder
  // trivial (k is small — insertion cost O(k) beats heap constant
  // factors there, and the buffer never exceeds k elements)
  private def insert(buf: List[(Long, String)],
                     e: (Long, String)): List[(Long, String)] = {
    if (buf.length >= k && better(buf.last, e)) buf
    else {
      val (pre, post) = buf.span(better(_, e))
      (pre ::: e :: post).take(k)
    }
  }

  override def zero: List[(Long, String)] = Nil
  override def reduce(b: List[(Long, String)],
                      a: (Long, String)): List[(Long, String)] = insert(b, a)
  override def merge(x: List[(Long, String)],
                     y: List[(Long, String)]): List[(Long, String)] =
    y.foldLeft(x)(insert)
  override def finish(b: List[(Long, String)]): Seq[(Long, String)] = b

  override def bufferEncoder: Encoder[List[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, String)]]()
  override def outputEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()
}

object TopKAgg {
  def of(k: Int): TopKAgg = new TopKAgg(k)
}
