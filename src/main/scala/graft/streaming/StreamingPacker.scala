package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the stateful form of the batch
  * concat-and-chunk packer (catalog `t12_sequence_packing`): documents
  * arrive as a stream per source, and each is assigned to the training
  * sequence where it STARTS, with the per-source token cursor carried
  * across micro-batches as keyed state.
  *
  * Semantics are identical to the batch window form
  * (`sum(tok) over (partition by source order by doc_id)`) when docs
  * arrive in doc_id order — the equivalence is spec-checked. State per
  * source is ONE long (the cursor), so executors hold O(sources), not
  * O(stream); sources shard the stream exactly like the batch
  * partition key, and a 100 TB pipeline runs one packer per
  * (source, shard) stream.
  *
  * Within a micro-batch the group's rows are sorted by `doc_id`
  * (arrival order inside a batch is partition-order-nondeterministic;
  * the sort makes the assignment a pure function of the data, the same
  * determinism discipline as the batch form). Across batches the
  * stream's batch sequence IS the order — feed batches in doc order;
  * the state carries the max doc_id already packed per source and
  * FAILS LOUDLY on an out-of-order arrival, so the documented
  * streaming-equals-batch invariant can never be broken silently.
  */
object StreamingPacker {

  case class DocTok(source: String, doc_id: Long, tok: Long)
  case class PackedDoc(source: String, doc_id: Long, tok: Long,
                       seq_id: Long, start: Long)
  /** Keyed state: the per-source token cursor plus the highest doc_id
    * already packed (the cross-batch monotonicity guard). (Not
    * `private` — the state encoder's generated code must see the
    * constructor.) */
  case class Cursor(cum: Long, maxDoc: Long)

  /** Per-doc sequence assignment with `budget` tokens per sequence.
    * Works on a streaming Dataset (flatMapGroupsWithState, Append) and
    * on a batch Dataset (one "batch", fresh state). Throws
    * IllegalStateException if a batch delivers a doc_id at or below one
    * already packed for its source — the batch-window semantics this
    * mirrors (`sum(tok) over (order by doc_id)`) are unrecoverable
    * once a smaller id has been appended at the cursor. */
  def packAssignments(docs: Dataset[DocTok],
                      budget: Long): Dataset[PackedDoc] = {
    require(budget > 0, s"budget must be positive, got $budget")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Cursor, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[DocTok], state: GroupState[Cursor]) =>
          val c0 = state.getOption.getOrElse(Cursor(0L, Long.MinValue))
          var cum = c0.cum
          val batch = it.toIndexedSeq.sortBy(_.doc_id)
          batch.headOption.filter(_.doc_id <= c0.maxDoc).foreach { d =>
            throw new IllegalStateException(
              s"out-of-order arrival for source '$source': doc ${d.doc_id} " +
                s"after doc ${c0.maxDoc} was already packed — feed batches " +
                "in doc_id order to keep streaming == batch")
          }
          val out = batch.map { d =>
            val start = cum
            cum += d.tok
            PackedDoc(source, d.doc_id, d.tok, start / budget, start)
          }
          state.update(Cursor(cum, batch.lastOption.fold(c0.maxDoc)(_.doc_id)))
          out.iterator
      }
  }
}
