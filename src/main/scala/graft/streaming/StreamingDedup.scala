package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication — the stateful-operator tier of the dedup
  * suite (`graft.dedup` covers batch): emit each key's FIRST-seen row
  * and drop the rest, across micro-batches.
  *
  * Two forms:
  *  - [[firstSeen]]: Spark's built-in `dropDuplicatesWithinWatermark` —
  *    state pruned by the watermark, the right default at scale;
  *  - [[firstSeenTyped]]: the same semantics hand-built on
  *    `mapGroupsWithState` (KeyValueGroupedDataset) — the extension
  *    point for richer policies (count-capped keys, TTL'd near-dup
  *    fingerprints, quota enforcement) where the built-in shape
  *    doesn't fit. State is one boolean per key with a processing-time
  *    timeout, so executors hold O(live keys), not O(stream).
  */
object StreamingDedup {

  /** Watermark-pruned streaming dedup on `keyCols`. `eventTimeCol` must
    * be a timestamp column already present in the frame. */
  def firstSeen(stream: DataFrame, eventTimeCol: String, watermark: String,
                keyCols: String*): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.toIndexedSeq)

  /** Typed first-seen-wins via explicit keyed state. With `stateTtl`
    * set, keys idle past the TTL are evicted (and would be admitted
    * again); note processing-time timeouts keep the query triggering
    * batches even when idle — fine under a real trigger cadence,
    * surprising under test drivers that wait for idleness. Without a
    * TTL, state is one boolean per distinct key for the stream's
    * lifetime — prefer [[firstSeen]] (watermark-pruned) at scale.
    *
    * Within one micro-batch a key's rows arrive in PARTITION ORDER —
    * nondeterministic across runs. By default the first of them wins
    * (cheap, matches the built-in's contract); pass `within` (e.g.
    * `Ordering.by(_.eventTime)`) to pick the minimum row instead and
    * make the survivor deterministic at the cost of draining the key's
    * batch iterator. Across micro-batches first-seen always wins. */
  def firstSeenTyped[T](stream: Dataset[T], key: T => String,
                        stateTtl: Option[String] = None,
                        within: Option[Ordering[T]] = None)
                       (implicit te: Encoder[T],
                        se: Encoder[Option[T]]): Dataset[T] = {
    import stream.sparkSession.implicits._
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    stream
      .groupByKey(key)
      .mapGroupsWithState[Boolean, Option[T]](timeoutConf) {
        (_: String, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); None }
          else if (state.exists) None
          else {
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            within match {
              case Some(ord) => if (rows.hasNext) Some(rows.min(ord)) else None
              case None => rows.nextOption()
            }
          }
      }
      .filter(_.isDefined)
      .map(_.get)
  }
}
