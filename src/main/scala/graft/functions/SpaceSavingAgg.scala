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
  * recycled). The buffer also carries a LOSSY flag — true once any
  * counter was recycled or a merge truncated — because "absent item
  * was never seen" can only be concluded from a summary that never
  * dropped anything; summary size alone can't distinguish "saw exactly
  * `capacity` distinct items, losslessly" from "recycled at that
  * size", and merging on the wrong conclusion would offset absent
  * items by a phantom minimum. Exactness guarantee: if `capacity` ≥
  * the number of distinct items actually seen (equality included),
  * nothing is ever dropped anywhere, the flag stays false, and the
  * summary IS the exact frequency table — the property the spec leans
  * on.
  *
  * Merge follows the standard summary-merge: sum counts of shared
  * items (errs add), offset absent items by the other summary's
  * minimum count bound (zero for lossless summaries), retake the top
  * `capacity`. Deterministic tie-break on (count DESC, item ASC) keeps
  * the result stable under any partitioning when ties are not at the
  * truncation boundary (and exact whenever the capacity bound above
  * holds).
  */
class SpaceSavingAgg(capacity: Int)
    extends Aggregator[String, (Map[String, (Long, Long)], Boolean),
                       Seq[(String, Long, Long)]]
    with Serializable {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: (Map[String, (Long, Long)], Boolean) = (Map.empty, false)

  /** Upper bound on how often an item ABSENT from this summary may have
    * been seen: 0 while the summary never dropped anything (absent ⇒
    * truly never seen), else the minimum retained count. */
  private def minCount(m: Map[String, (Long, Long)], lossy: Boolean): Long =
    if (!lossy) 0L else m.valuesIterator.map(_._1).min

  override def reduce(b: (Map[String, (Long, Long)], Boolean),
                      item: String): (Map[String, (Long, Long)], Boolean) = {
    val (m, lossy) = b
    m.get(item) match {
      case Some((c, e)) => (m.updated(item, (c + 1, e)), lossy)
      case None if m.size < capacity => (m.updated(item, (1L, 0L)), lossy)
      case None =>
        // recycle the minimum counter: new item inherits its count as
        // error bound (the SpaceSaving step)
        val (minItem, (minC, _)) = m.minBy { case (i, (c, _)) => (c, i) }
        ((m - minItem).updated(item, (minC + 1, minC)), true)
    }
  }

  override def merge(x: (Map[String, (Long, Long)], Boolean),
                     y: (Map[String, (Long, Long)], Boolean)):
      (Map[String, (Long, Long)], Boolean) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    val mx = minCount(x._1, x._2); val my = minCount(y._1, y._2)
    val merged = mutable.Map.empty[String, (Long, Long)]
    (x._1.keySet ++ y._1.keySet).foreach { item =>
      (x._1.get(item), y._1.get(item)) match {
        case (Some((cx, ex)), Some((cy, ey))) =>
          merged(item) = (cx + cy, ex + ey)
        case (Some((cx, ex)), None) => merged(item) = (cx + my, ex + my)
        case (None, Some((cy, ey))) => merged(item) = (cy + mx, ey + mx)
        case (None, None) => ()
      }
    }
    val lossy = x._2 || y._2 || merged.size > capacity
    if (merged.size <= capacity) (merged.toMap, lossy)
    else (merged.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(capacity)
      .toMap, lossy)
  }

  /** (item, count, err) sorted by count desc then item — count-err is a
    * lower bound, count an upper bound on the true frequency. */
  override def finish(b: (Map[String, (Long, Long)], Boolean)):
      Seq[(String, Long, Long)] =
    b._1.toSeq.map { case (i, (c, e)) => (i, c, e) }
      .sortBy { case (i, c, _) => (-c, i) }

  override def bufferEncoder: Encoder[(Map[String, (Long, Long)], Boolean)] =
    ExpressionEncoder[(Map[String, (Long, Long)], Boolean)]()
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}

object SpaceSavingAgg {
  def of(capacity: Int): SpaceSavingAgg = new SpaceSavingAgg(capacity)
}
