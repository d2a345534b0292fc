package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** The flagship view: `customer_purchase_summary`.
  *
  * Re-expresses the reference's Dynamic Table query
  * (`notebooks/0_start_here.ipynb:215-245`, cell `create_dynamic_table`):
  * a 4-way star join of the fact table against three dimensions with a
  * cross-dimension join conjunct (`m.merchant_category =
  * p.product_category` — note it references the already-joined products
  * table, so merchant rows are filtered per product row) and a derived
  * measure that RECOMPUTES `total_price = quantity * price` from the
  * dimension price, ignoring the stored fact amount
  * (`0_start_here.ipynb:233`).
  *
  * Scale posture: the three dimensions are broadcast (they are small in
  * the reference — 1803/14/12 rows — and dimension-sized in general);
  * the fact side streams through three BroadcastHashJoins in a single
  * whole-stage-codegen pipeline with no shuffle. If a dimension
  * outgrows the broadcast threshold Catalyst falls back to a shuffled
  * hash join on the equi-keys — the plan shape degrades gracefully.
  */
object PurchaseSummary {

  /** Expected input columns (reference `scripts/postgresql_setup.sql:9-42`):
    *  - tx: transaction_id, customer_id, product_id, merchant_id,
    *        transaction_date, transaction_time, quantity, total_price,
    *        transaction_card, transaction_category
    *  - customers: customer_id, age, …
    *  - products:  product_id, product_name, product_category, price
    *  - merchants: merchant_id, merchant_name, merchant_category
    */
  def customerPurchaseSummary(tx: DataFrame, customers: DataFrame,
                              products: DataFrame, merchants: DataFrame,
                              broadcastDims: Boolean = true): DataFrame = {
    // the broadcast hint OVERRIDES the size threshold, so it must be a
    // knob: pass broadcastDims = false when a dimension is too large to
    // ship to every executor, and the same plan falls back to shuffled
    // hash/sort-merge joins on the equi-keys (shape spec-checked)
    def dim(df: DataFrame) = if (broadcastDims) broadcast(df) else df
    val t = tx.alias("t")
    val c = dim(customers).alias("c")
    val p = dim(products).alias("p")
    val m = dim(merchants).alias("m")
    t.join(c, col("t.customer_id") === col("c.customer_id"))
      .join(p, col("t.product_id") === col("p.product_id"))
      .join(m, col("t.merchant_id") === col("m.merchant_id") &&
               col("m.merchant_category") === col("p.product_category"))
      .select(
        col("t.transaction_id"),
        col("t.customer_id"),
        col("c.age").as("customer_age"),
        col("t.product_id"),
        col("p.product_name"),
        col("p.product_category"),
        col("t.merchant_id"),
        col("m.merchant_name"),
        col("m.merchant_category"),
        col("t.transaction_date"),
        col("t.transaction_time"),
        col("t.quantity"),
        (col("t.quantity") * col("p.price")).as("total_price"),
        col("t.transaction_card"),
        col("t.transaction_category"))
  }

  /** Typed form: same plan, `Dataset[PurchaseSummary]` out — field
    * access checked at compile time downstream. */
  def customerPurchaseSummaryTyped(
      tx: Dataset[Schemas.Transaction],
      customers: Dataset[Schemas.Customer],
      products: Dataset[Schemas.Product],
      merchants: Dataset[Schemas.Merchant]): Dataset[Schemas.PurchaseSummary] = {
    val spark = tx.sparkSession
    import spark.implicits._
    customerPurchaseSummary(
      tx.toDF(), customers.toDF(), products.toDF(), merchants.toDF())
      .as[Schemas.PurchaseSummary]
  }
}
