package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history from a CDC change stream:
  * instead of keeping only the latest row per key (what
  * [[CdcApply.applyBatch]] / the replicated tables do), keep EVERY
  * version, each tagged with its validity interval in the WAL order —
  * `[valid_from_lsn, valid_to_lsn)`, open (null `valid_to_lsn`) for
  * the live version. DELETE events close the previous version and
  * contribute no row of their own, so a deleted key simply has no
  * open interval.
  *
  * This is the auditable form of replication: `asOf(history, lsn)`
  * reconstructs the table EXACTLY as [[CdcApply]] would have produced
  * it after applying the prefix of changes up to `lsn` — the property
  * Scd2HistorySpec tests against random change sequences. Joining the
  * fact against history on `pk` + transaction-lsn range is the
  * dimension-as-of-transaction-time join a warehouse needs when
  * dimensions drift.
  *
  * Scale posture: [[fromChanges]] is one window over (keys, lsn) —
  * one shuffle of the CHANGE LOG, not the table. [[applyBatch]] touches
  * only batch keys: open intervals of touched keys close via a
  * broadcast-sized join on the per-key first batch lsn, new versions
  * come from the batch-local window; history rows of untouched keys
  * pass through untouched (and under a partitioned store, unread).
  */
object Scd2History {

  val FromCol = "valid_from_lsn"
  val ToCol = "valid_to_lsn"
  val CurrentCol = "is_current"

  /** Build the full history from a complete change log (batch path,
    * also the oracle for the incremental path). Assumes `_lsn` values
    * are unique per key (they are globally unique in a WAL). */
  def fromChanges(changes: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(CdcApply.LsnCol))
    changes
      .withColumn(ToCol, lead(col(CdcApply.LsnCol), 1).over(w))
      .withColumn(FromCol, col(CdcApply.LsnCol))
      .filter(col(CdcApply.OpCol) =!= CdcApply.Delete)
      .withColumn(CurrentCol, col(ToCol).isNull)
      .drop(CdcApply.MetaCols: _*)
  }

  /** Fold one change batch into an existing history. Requires in-order
    * delivery: every `_lsn` in the batch is greater than every lsn
    * already recorded for the same key — which is what the replication
    * pipeline's WAL order guarantees. Idempotence is NOT required of
    * this path (re-delivery is handled upstream by the versioned-table
    * commit protocol); batch-split invariance is property-tested. */
  def applyBatch(history: DataFrame, changes: DataFrame,
                 keys: Seq[String]): DataFrame = {
    val firstLsn = changes.groupBy(keys.map(col): _*)
      .agg(min(col(CdcApply.LsnCol)).as("__close"))
    val closed = history.join(firstLsn, keys, "left")
      .withColumn(ToCol,
        when(col(CurrentCol) && col("__close").isNotNull, col("__close"))
          .otherwise(col(ToCol)))
      .withColumn(CurrentCol, col(CurrentCol) && col("__close").isNull)
      .drop("__close")
    closed.unionByName(fromChanges(changes, keys))
  }

  /** The table as of WAL position `lsn` (inclusive): exactly the rows
    * whose validity interval covers it. Equals CdcApply over the
    * change-log prefix ≤ lsn (property-tested). */
  def asOf(history: DataFrame, lsn: Long): DataFrame =
    history.filter(col(FromCol) <= lsn &&
        (col(ToCol).isNull || col(ToCol) > lsn))
      .drop(FromCol, ToCol, CurrentCol)

  /** The live table: open intervals only — same rows as the replicated
    * table [[CdcApply]] maintains. */
  def current(history: DataFrame): DataFrame =
    history.filter(col(CurrentCol)).drop(FromCol, ToCol, CurrentCol)
}
