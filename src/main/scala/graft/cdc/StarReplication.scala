package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.PurchaseSummary
import graft.streaming.DynamicTable

/** Whole-star CDC orchestration: replicate all four reference tables
  * (customers, merchants, products, transactions — the reference
  * publishes `FOR ALL TABLES`, `scripts/postgresql_setup.sql:51`) and
  * keep the `customer_purchase_summary` dynamic table maintained off
  * every feed, dimensions included (`0_start_here.ipynb:81-130` for
  * the per-table replication, `:215-245` for the view).
  *
  * Wiring per table feed:
  *  - transactions → fact replica apply, then fact-delta view refresh;
  *  - any dimension → dim replica apply, then [[DynamicTable.dimensionRefresh]]
  *    (affected-fact recompute — value changes, drop-outs, join-ins).
  *
  * The fact and the view are date-partitioned
  * ([[PartitionedReplicatedTable]]) — the 100 TB layout: a steady-state
  * fact batch rewrites only the touched date partitions of both.
  * Dimensions are small and use whole-table versioned replicas.
  *
  * Each table runs as its own streaming query (name it per table and
  * register a [[CdcPipeline.ReplicationMonitor]] for the per-table
  * status surface the reference exposes). View maintenance serializes
  * on an internal lock: micro-batches of different feeds interleave,
  * and the result table's read-merge-write must not race. Cross-feed
  * ordering is NOT guaranteed — like the reference, the view converges
  * to the replicated state within one TARGET_LAG of quiescence.
  */
final class StarReplication(spark: SparkSession, dir: String) {

  val transactions = new PartitionedReplicatedTable(
    spark, s"$dir/transactions", Seq("transaction_id"), "transaction_date")
  val customers = new ReplicatedTable(spark, s"$dir/customers", Seq("customer_id"))
  val products = new ReplicatedTable(spark, s"$dir/products", Seq("product_id"))
  val merchants = new ReplicatedTable(spark, s"$dir/merchants", Seq("merchant_id"))
  val view = new PartitionedReplicatedTable(
    spark, s"$dir/view", Seq("transaction_id"), "transaction_date")

  /** The dimension feeds this pipeline understands, keyed by the same
    * names the reference's connector uses for the source tables. */
  val dimensions: Map[String, DynamicTable.DimBinding] = Map(
    "customers" -> DynamicTable.DimBinding(customers, "customer_id"),
    "products" -> DynamicTable.DimBinding(products, "product_id"),
    "merchants" -> DynamicTable.DimBinding(merchants, "merchant_id"))

  private def viewOf(fact: DataFrame): DataFrame =
    PurchaseSummary.customerPurchaseSummary(
      fact, customers.current(), products.current(), merchants.current())

  val dynamicTable =
    new DynamicTable(transactions, view, viewOf, dimensions)

  private val maintenanceLock = new Object

  /** Phase 1 — initial snapshot of all four tables, then the first full
    * view materialization (`SNAPSHOT_REPLICATION_STATUS` per table in
    * the reference). */
  def snapshotAll(tx: DataFrame, cust: DataFrame,
                  prod: DataFrame, merch: DataFrame): Unit = {
    customers.snapshot(cust)
    products.snapshot(prod)
    merchants.snapshot(merch)
    transactions.snapshot(tx)
    dynamicTable.fullRefresh()
  }

  /** Apply one change batch of a named table (a `foreachBatch` body or
    * a batch caller). Dim state commits before the view refresh reads
    * it; the whole step serializes against other feeds. */
  def applyBatch(table: String, batch: DataFrame): Unit = maintenanceLock.synchronized {
    table match {
      case "transactions" =>
        transactions.applyChanges(batch)
        dynamicTable.incrementalRefresh(batch)
      case dim if dimensions.contains(dim) =>
        dimensions(dim).table.applyChanges(batch)
        dynamicTable.dimensionRefresh(dim, batch)
      case other => throw new IllegalArgumentException(
        s"unknown star table '$other'")
    }
  }

  /** Phase 2 — tail all feeds continuously. One streaming query per
    * table, each named `star-<table>` (the ReplicationMonitor surface
    * then reports per-table progress like the reference's
    * `REPLICATION_STATE`/`CONNECTOR_STATS`). */
  def startAll(feeds: Map[String, DataFrame], checkpointRoot: String,
               trigger: Trigger = Trigger.AvailableNow()): Map[String, StreamingQuery] =
    feeds.map { case (table, changes) =>
      table -> changes.writeStream
        .queryName(s"star-$table")
        .option("checkpointLocation", s"$checkpointRoot/$table")
        .trigger(trigger)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          applyBatch(table, batch)
        }
        .start()
    }
}
