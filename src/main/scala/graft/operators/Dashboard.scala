package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.money._

/** The interactive-analytics operator library.
  *
  * Re-expresses every DataFrame/pandas operation of the reference
  * dashboard (`scripts/customer_spending_dashboard.py`) as a composable
  * Spark function over the `customer_purchase_summary` view (or any
  * frame with the same columns). The pandas chart-side aggregations of
  * the reference become ordinary distributed group-bys — there is no
  * driver-side boundary.
  *
  * All money aggregates use [[graft.functions.money]] (exact integer
  * cents) so results are deterministic under any partitioning.
  */
object Dashboard {

  private val purchase = col("transaction_category") === "Purchase"

  /** Per-customer spend with CASE bucketing
    * (`customer_spending_dashboard.py:16-25`). Thresholds default to the
    * reference's literals; callers tune them to the data's scale.
    */
  def calculateCustomerSpending(data: DataFrame,
                                low: Double = 4000.0,
                                high: Double = 6000.0): DataFrame =
    data.filter(purchase)
      .groupBy("customer_id")
      .agg(sumMoney(col("total_price")).as("total_price"))
      .withColumn("spend_status",
        when(col("total_price") < low, "Low Spenders")
          .when(col("total_price") >= low && col("total_price") < high,
                "Medium Spenders")
          .otherwise("High Spenders"))

  /** Age bucketing (`customer_spending_dashboard.py:27-35`). The
    * reference CASE chain has no `otherwise`, so ages outside [18,90]
    * map to NULL — preserved here.
    */
  def categorizeByAge(data: DataFrame): DataFrame = {
    val a = col("customer_age")
    data.withColumn("age_group",
      when(a >= 18 && a <= 25, "Gen Z")
        .when(a >= 26 && a <= 41, "Millennials")
        .when(a >= 42 && a <= 57, "Gen X")
        .when(a >= 58 && a <= 76, "Boomers")
        .when(a >= 77 && a <= 90, "Silent Generation"))
  }

  /** Spend-status headcount with guaranteed buckets
    * (`customer_spending_dashboard.py:37-41`): filter spend > 0, count
    * per bucket, then left-join a literal bucket frame with
    * `coalesce(count, 0)` — the distributed form of pandas
    * `reindex(fill_value=0)`.
    */
  def spendStatusCounts(customerSpending: DataFrame): DataFrame = {
    val spark = customerSpending.sparkSession
    import spark.implicits._
    val buckets = Seq("High Spenders", "Medium Spenders", "Low Spenders")
      .toDF("spend_status")
    val counts = customerSpending
      .filter(col("total_price") > 0)
      .groupBy("spend_status").agg(count(lit(1)).as("cnt"))
    buckets.join(broadcast(counts), Seq("spend_status"), "left")
      .select(col("spend_status"), coalesce(col("cnt"), lit(0L)).as("count"))
  }

  /** Inclusive date-range filter (`customer_spending_dashboard.py:67-70`). */
  def filterDateRange(data: DataFrame, start: String, end: String): DataFrame =
    data.filter(col("transaction_date").between(
      lit(start).cast("date"), lit(end).cast("date")))

  /** Equality filter on transaction category
    * (`customer_spending_dashboard.py:17,76`). */
  def filterCategory(data: DataFrame, category: String): DataFrame =
    data.filter(col("transaction_category") === category)

  /** Keep rows whose customer is in the given spend bucket — the
    * `isin(subquery)` of `customer_spending_dashboard.py:80-81`,
    * expressed as an explicit left-semi join (what Snowflake's optimizer
    * rewrites it to; Catalyst ditto via RewritePredicateSubquery).
    */
  def filterBySpendStatus(data: DataFrame, customerSpending: DataFrame,
                          status: String): DataFrame =
    data.join(
      customerSpending.filter(col("spend_status") === status)
        .select("customer_id"),
      Seq("customer_id"), "left_semi")

  /** Enrich rows with their customer's spend bucket — the left join of
    * `customer_spending_dashboard.py:189`. */
  def withSpendStatus(data: DataFrame, customerSpending: DataFrame): DataFrame =
    data.join(customerSpending.select("customer_id", "spend_status"),
              Seq("customer_id"), "left")

  /** Earliest transaction date (`customer_spending_dashboard.py:52`). */
  def earliestDate(data: DataFrame): DataFrame =
    data.agg(min(col("transaction_date")).as("earliest_date"))

  /** Total spent on purchases, 0.0 on empty input
    * (`customer_spending_dashboard.py:91-93`). */
  def totalSpent(data: DataFrame): DataFrame =
    data.filter(purchase)
      .agg(coalesce(sumMoney(col("total_price")), lit(0.0)).as("total_spent"))

  /** Distinct customer ids (`customer_spending_dashboard.py:64`). */
  def distinctCustomers(data: DataFrame): DataFrame =
    data.select("customer_id").distinct()

  /** Daily items by category — pandas chart agg A7
    * (`customer_spending_dashboard.py:102`). */
  def dailyItems(data: DataFrame): DataFrame =
    data.groupBy("transaction_date", "transaction_category")
      .agg(sum(col("quantity")).as("total_items"))

  /** Transactions per card type — pandas chart agg A8
    * (`customer_spending_dashboard.py:113`). */
  def cardCounts(data: DataFrame): DataFrame =
    data.groupBy("transaction_card")
      .agg(count(col("transaction_id")).as("transaction_count"))

  /** Purchases per product category — pandas chart agg A9
    * (`customer_spending_dashboard.py:127`). */
  def categoryCounts(data: DataFrame): DataFrame =
    data.groupBy("product_category")
      .agg(count(col("transaction_id")).as("purchase_count"))

  /** Per-merchant transaction count + revenue — pandas chart agg A10
    * (`customer_spending_dashboard.py:137`). */
  def merchantStats(data: DataFrame): DataFrame =
    data.groupBy("merchant_name")
      .agg(count(col("transaction_id")).as("transaction_count"),
           sumMoney(col("total_price")).as("total_price"))

  /** Per-merchant revenue (`customer_spending_dashboard.py:161`). */
  def merchantRevenue(data: DataFrame): DataFrame =
    data.groupBy("merchant_name")
      .agg(sumMoney(col("total_price")).as("total_price"))

  /** Top-k merchants by revenue — sort-desc + first of
    * `customer_spending_dashboard.py:162-163`, generalized. Compiles to
    * TakeOrderedAndProject (no global sort materialization).
    * merchant_name breaks revenue ties deterministically.
    */
  def topMerchants(data: DataFrame, k: Int = 1): DataFrame =
    merchantRevenue(data)
      .orderBy(col("total_price").desc, col("merchant_name"))
      .limit(k)

  /** The sidebar's full filter composition
    * (`customer_spending_dashboard.py:48-88` `apply_filters`): an
    * inclusive date range always applies; each optional filter chains
    * an equality (customer id, transaction category, age group) or the
    * spend-status semi-join when set ("All" in the UI = `None` here).
    * Conjunctive single-table predicates collapse into one pushed scan
    * filter; the spend-status branch stays a broadcast semi-join.
    * `data` must carry `age_group` (apply [[categorizeByAge]] first)
    * when `ageGroup` is set.
    */
  def applyFilters(data: DataFrame, customerSpending: DataFrame,
                   startDate: String, endDate: String,
                   customerId: Option[Long] = None,
                   category: Option[String] = None,
                   spendStatus: Option[String] = None,
                   ageGroup: Option[String] = None): DataFrame = {
    var out = filterDateRange(data, startDate, endDate)
    customerId.foreach(id => out = out.filter(col("customer_id") === id))
    category.foreach(c => out = filterCategory(out, c))
    spendStatus.foreach(s => out = filterBySpendStatus(out, customerSpending, s))
    ageGroup.foreach(g => out = out.filter(col("age_group") === g))
    out
  }
}
