package graft.cdc

import org.apache.spark.sql.DataFrame

/** A CDC-maintained keyed table: the storage contract shared by the
  * flat [[ReplicatedTable]] (whole-table versioning) and the
  * [[PartitionedReplicatedTable]] (partition-scoped versioning).
  * [[graft.streaming.DynamicTable]] and [[CdcPipeline]] operate against
  * this interface, so a pipeline scales from laptop to
  * date-partitioned 100 TB by swapping the implementation.
  */
trait KeyedTable {
  def keys: Seq[String]
  def isSnapshotDone: Boolean
  def snapshot(df: DataFrame): Unit
  def current(): DataFrame
  /** Apply one change batch (table columns + CdcApply.MetaCols). */
  def applyChanges(changes: DataFrame): Unit
}
