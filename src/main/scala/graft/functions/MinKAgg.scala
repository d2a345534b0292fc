package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group smallest-k as a mergeable typed `Aggregator` — the
  * ascending dual of [[TopKAgg]], over (score, id, payload) triples
  * ordered by (score ASC, id ASC).
  *
  * Same scale contract: the window formulation shuffles and sorts
  * every group's full row set; this folds rows into a k-bounded
  * buffer with map-side partials — O(n log k) work, O(k) state, only
  * k rows per group cross the shuffle. Merge is commutative/
  * associative with a total order, so results are identical under any
  * partitioning or AQE re-plan.
  *
  * The motivating consumer is weighted sampling
  * ([[graft.text.Mixture.weightedSampleAgg]]): the A-ES priority is
  * the score, so "k smallest priorities per stratum" IS the weighted
  * sample — one aggregation, no per-stratum sort. */
class MinKAgg(k: Int)
    extends Aggregator[(Long, Long, Long), List[(Long, Long, Long)],
                       Seq[(Long, Long, Long)]]
    with Serializable {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Long, Long, Long)],
                     e: (Long, Long, Long)): List[(Long, Long, Long)] = {
    if (buf.length >= k && better(buf.last, e)) buf
    else {
      val (pre, post) = buf.span(better(_, e))
      (pre ::: e :: post).take(k)
    }
  }

  override def zero: List[(Long, Long, Long)] = Nil
  override def reduce(b: List[(Long, Long, Long)],
                      a: (Long, Long, Long)): List[(Long, Long, Long)] =
    insert(b, a)
  override def merge(x: List[(Long, Long, Long)],
                     y: List[(Long, Long, Long)]): List[(Long, Long, Long)] =
    y.foldLeft(x)(insert)
  override def finish(b: List[(Long, Long, Long)]): Seq[(Long, Long, Long)] = b

  override def bufferEncoder: Encoder[List[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
}

object MinKAgg {
  def of(k: Int): MinKAgg = new MinKAgg(k)
}
