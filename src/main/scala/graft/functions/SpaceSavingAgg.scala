package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy hitters (Metwally et al., "Efficient computation
  * of frequent and top-k elements in data streams", ICDT 2005) as a
  * mergeable typed `Aggregator`: one pass, `capacity` counters, and
  * every item with true frequency > N/capacity is guaranteed present —
  * the way a 100 TB pipeline finds frequent tokens/n-grams WITHOUT a
  * full-cardinality groupBy shuffle (state is O(capacity) per group,
  * map-side partials shrink each partition to `capacity` counters
  * before the exchange).
  *
  * Counters carry (count, err): `count` overestimates the true
  * frequency by at most `err` (the count absorbed when the counter was
  * recycled). Exactness guarantee: if `capacity` ≥ the number of
  * distinct items actually seen, no counter is ever recycled, every
  * `err` is 0, and the summary IS the exact frequency table — the
  * property the spec leans on.
  *
  * Merge follows the standard summary-merge: sum counts of shared
  * items (errs add), offset absent items by the other summary's
  * minimum count bound, retake the top `capacity`. Deterministic
  * tie-break on (count DESC, item ASC) keeps the result stable under
  * any partitioning when ties are not at the truncation boundary (and
  * exact whenever the capacity bound above holds).
  */
class SpaceSavingAgg(capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)],
                       Seq[(String, Long, Long)]]
    with Serializable {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, (Long, Long)] = Map.empty

  private def minCount(m: Map[String, (Long, Long)]): Long =
    if (m.size < capacity) 0L else m.valuesIterator.map(_._1).min

  override def reduce(m: Map[String, (Long, Long)],
                      item: String): Map[String, (Long, Long)] =
    m.get(item) match {
      case Some((c, e)) => m.updated(item, (c + 1, e))
      case None if m.size < capacity => m.updated(item, (1L, 0L))
      case None =>
        // recycle the minimum counter: new item inherits its count as
        // error bound (the SpaceSaving step)
        val (minItem, (minC, _)) = m.minBy { case (i, (c, _)) => (c, i) }
        (m - minItem).updated(item, (minC + 1, minC))
    }

  override def merge(x: Map[String, (Long, Long)],
                     y: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val mx = minCount(x); val my = minCount(y)
    val merged = mutable.Map.empty[String, (Long, Long)]
    (x.keySet ++ y.keySet).foreach { item =>
      (x.get(item), y.get(item)) match {
        case (Some((cx, ex)), Some((cy, ey))) =>
          merged(item) = (cx + cy, ex + ey)
        case (Some((cx, ex)), None) => merged(item) = (cx + my, ex + my)
        case (None, Some((cy, ey))) => merged(item) = (cy + mx, ey + mx)
        case (None, None) => ()
      }
    }
    if (merged.size <= capacity) merged.toMap
    else merged.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(capacity)
      .toMap
  }

  /** (item, count, err) sorted by count desc then item — count-err is a
    * lower bound, count an upper bound on the true frequency. */
  override def finish(m: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    m.toSeq.map { case (i, (c, e)) => (i, c, e) }
      .sortBy { case (i, c, _) => (-c, i) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    ExpressionEncoder[Map[String, (Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}

object SpaceSavingAgg {
  def of(capacity: Int): SpaceSavingAgg = new SpaceSavingAgg(capacity)
}
