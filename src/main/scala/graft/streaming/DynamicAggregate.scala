package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cdc.{CdcApply, KeyedTable}

/** An incrementally-maintained AGGREGATE view — the group-keyed
  * companion to [[DynamicTable]] (which maintains views keyed by the
  * fact's own primary key). Re-expresses the reference dashboard's
  * `customer_spending` (per-customer spend buckets recomputed from the
  * dynamic table on every run, `customer_spending_dashboard.py:16-25`)
  * as a continuously-maintained table.
  *
  * `viewOf` maps fact rows to ONE aggregate row per `groupKeys` value
  * (a groupBy over the fact). The delta rule: a change batch can only
  * move rows of the groups it mentions — the groups of the batch rows'
  * NEW images plus the groups those primary keys belonged to BEFORE
  * the merge (an UPDATE may move a row between groups, and the old
  * group's aggregate must shrink). Recomputing `viewOf` over exactly
  * those groups' fact rows, after the fact merge, yields the correct
  * post-change aggregates; affected groups with no remaining rows
  * become deletions.
  *
  * Because the OLD group memberships must be read from the
  * pre-merge fact, [[refresh]] performs the fact merge itself —
  * callers hand it the raw change batch INSTEAD of calling
  * `fact.applyChanges` first (the inverse of the DynamicTable order;
  * asserted in the spec).
  *
  * Scale posture: the affected-group set is batch-sized (collected
  * group keys of the delta, broadcast into two semi-joins); the
  * recompute aggregates only those groups' fact rows, never the full
  * fact. Exactness — incremental ≡ full groupBy recompute over random
  * interleaved insert/update/delete sequences including group-moving
  * updates — is property-tested in DynamicAggregateSpec.
  */
final class DynamicAggregate(fact: KeyedTable,
                             result: KeyedTable,
                             groupKeys: Seq[String],
                             viewOf: DataFrame => DataFrame) {

  require(result.keys == groupKeys,
    s"result key ${result.keys} must equal the group key $groupKeys")

  /** Full recompute (initializes or repairs the result table). */
  def fullRefresh(): Unit = {
    val view = viewOf(fact.current())
    if (result.isSnapshotDone) {
      val upserts = withMeta(view, CdcApply.Update)
      val vanished = result.current()
        .join(view.select(groupKeys.map(col): _*), groupKeys, "left_anti")
      result.applyChanges(upserts.unionByName(
        deleteEvents(vanished, view)))
    } else result.snapshot(view)
  }

  /** Merge one fact change batch AND fold it into the aggregate. */
  def refresh(factChanges: DataFrame): Unit = {
    if (!result.isSnapshotDone) {
      fact.applyChanges(factChanges); fullRefresh(); return
    }
    val winners = CdcApply.latest(factChanges, fact.keys)
    val gk = groupKeys.map(col)
    // groups the touched primary keys belong to BEFORE the merge …
    val oldGroups = fact.current()
      .join(winners.select(fact.keys.map(col): _*), fact.keys, "left_semi")
      .select(gk: _*).distinct()
    // … plus the groups of the new images
    val newGroups = winners.filter(col(CdcApply.OpCol) =!= CdcApply.Delete)
      .select(gk: _*).distinct()
    val affected = oldGroups.unionByName(newGroups).distinct()
      .filter(gk.map(_.isNotNull).reduce(_ && _))
      .cache() // pin pre-merge membership: the plan must not re-read post-merge state
    affected.count()

    fact.applyChanges(factChanges)

    val scope = fact.current()
      .join(broadcast(affected), groupKeys, "left_semi")
    val upserts = viewOf(scope)
    val deletions = affected
      .join(upserts.select(gk: _*), groupKeys, "left_anti")
    result.applyChanges(
      withMeta(upserts, CdcApply.Update)
        .unionByName(deleteEvents(deletions, upserts)))
    affected.unpersist()
  }

  private def withMeta(df: DataFrame, op: String): DataFrame =
    df.withColumn(CdcApply.OpCol, lit(op))
      .withColumn(CdcApply.LsnCol, lit(1L))
      .withColumn(CdcApply.CommitTsCol, current_timestamp())

  private def deleteEvents(src: DataFrame, shaped: DataFrame): DataFrame = {
    val padded = src.select(shaped.columns.toIndexedSeq.map { c =>
      if (src.columns.contains(c)) col(c)
      else lit(null).cast(shaped.schema(c).dataType).as(c)
    }: _*)
    withMeta(padded, CdcApply.Delete)
  }
}
