package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.TestData
import graft.operators.{Dashboard, PurchaseSummary}
import graft.functions.money._

/** The engine's query catalog — one named query per operator of
  * `SURVEY.md` §2, each runnable over a testdata scale-factor directory
  * and hash-checked against [[Oracle]] by the driver.
  *
  * Every query ends in a deterministic ORDER BY on non-null keys so the
  * Spark result and the DuckDB oracle agree row-for-row.
  */
object Queries {

  /** Spend-bucket thresholds scaled to the testdata's per-customer
    * totals (the reference's 4000/6000 split its ~$5k-spend customers;
    * see Dashboard.calculateCustomerSpending for the semantics). */
  val SpendLow = 20000.0
  val SpendHigh = 60000.0

  private def summary(spark: SparkSession, dir: String): DataFrame = {
    val st = TestData.star(spark, dir)
    PurchaseSummary.customerPurchaseSummary(
      st.transactions, st.customers, st.products, st.merchants)
  }

  private def spending(df: DataFrame): DataFrame =
    Dashboard.calculateCustomerSpending(df, SpendLow, SpendHigh)

  /** Deterministic total order for summary rows. `transaction_id`
    * ("orderkey-linenumber") is NOT unique in the synthetic testdata, so
    * we order by a key set that functionally determines all 15 output
    * columns — any remaining ties are bit-identical rows. */
  private val summaryOrder = Seq("transaction_id", "product_id",
    "merchant_id", "quantity", "transaction_category").map(col)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.3 J1-J3 + §2.2 P1/P2: the flagship 4-way star join.
    "q01_purchase_summary" -> ((s, d) =>
      summary(s, d).orderBy(summaryOrder: _*)),

    // A1 grouped sum + P7 CASE bucketing + P3 filter.
    "q02_customer_spending" -> ((s, d) =>
      spending(summary(s, d)).orderBy("customer_id")),

    // P8 CASE chain without otherwise (NULL outside 18-90) + P9.
    "q03_age_groups" -> ((s, d) =>
      Dashboard.categorizeByAge(summary(s, d))
        .select("transaction_id", "customer_id", "customer_age", "age_group")
        .orderBy("transaction_id")),

    // A2 grouped count + P4 comparison filter + A12 reindex-with-fill.
    "q04_spend_status_counts" -> ((s, d) =>
      Dashboard.spendStatusCounts(spending(summary(s, d)))
        .orderBy("spend_status")),

    // P5 date-range + P6 conjunction.
    "q05_date_range" -> ((s, d) =>
      Dashboard.filterDateRange(summary(s, d), "1998-01-01", "1999-12-31")
        .orderBy(summaryOrder: _*)),

    // A4 global sum + P16 coalesce-on-empty.
    "q06_total_spent" -> ((s, d) => Dashboard.totalSpent(summary(s, d))),

    // A3 global min.
    "q07_earliest_date" -> ((s, d) => Dashboard.earliestDate(summary(s, d))),

    // A11 distinct.
    "q08_distinct_customers" -> ((s, d) =>
      Dashboard.distinctCustomers(summary(s, d)).orderBy("customer_id")),

    // J4 left outer join.
    "q09_with_spend_status" -> ((s, d) => {
      val sm = summary(s, d)
      Dashboard.withSpendStatus(
        sm.select("transaction_id", "customer_id", "merchant_name", "total_price"),
        spending(sm))
        .select("transaction_id", "customer_id", "merchant_name",
                "total_price", "spend_status")
        .orderBy("transaction_id", "merchant_name", "total_price")
    }),

    // J5 left-semi join (the dashboard's isin(subquery)).
    "q10_semi_high_spenders" -> ((s, d) => {
      val sm = summary(s, d)
      Dashboard.filterBySpendStatus(sm, spending(sm), "High Spenders")
        .select("transaction_id", "customer_id", "total_price")
        .orderBy("transaction_id", "total_price")
    }),

    // A7 multi-key grouped sum (pandas chart agg, distributed).
    "q11_daily_items" -> ((s, d) =>
      Dashboard.dailyItems(summary(s, d))
        .orderBy("transaction_date", "transaction_category")),

    // A8 grouped count by card.
    "q12_card_counts" -> ((s, d) =>
      Dashboard.cardCounts(summary(s, d)).orderBy("transaction_card")),

    // A9 grouped count by product category.
    "q13_category_counts" -> ((s, d) =>
      Dashboard.categoryCounts(summary(s, d)).orderBy("product_category")),

    // A10 multi-aggregate group by merchant.
    "q14_merchant_stats" -> ((s, d) =>
      Dashboard.merchantStats(summary(s, d)).orderBy("merchant_name")),

    // O1/O3 top-1 merchant by revenue (TakeOrderedAndProject).
    "q15_top_merchant" -> ((s, d) => Dashboard.topMerchants(summary(s, d), 1)),

    // O1 generalized top-k.
    "q16_topk_merchants" -> ((s, d) => Dashboard.topMerchants(summary(s, d), 5)),

    // P3 equality filter (Refund branch).
    "q17_refunds" -> ((s, d) =>
      Dashboard.filterCategory(summary(s, d), "Refund")
        .select("transaction_id", "customer_id", "merchant_name", "total_price")
        .orderBy("transaction_id", "merchant_name", "total_price")),

    // P10-P14: concat, casts, date/time functions, array literal + index
    // (the deterministic core of the reference's row generator).
    "q18_scalar_exprs" -> ((s, d) =>
      TestData.table(s, d, "lineitem").select(
        concat(lit("TX"), col("l_orderkey").cast("string"),
               col("l_linenumber").cast("string")).as("gen_id"),
        element_at(
          array(lit("American Express"), lit("Visa"),
                lit("Mastercard"), lit("Discover")),
          (pmod(col("l_orderkey"), lit(4)) + 1).cast("int")).as("card"),
        (pmod(col("l_orderkey") + col("l_linenumber"), lit(7)) + 1)
          .cast("int").as("gen_quantity"),
        year(col("l_shipdate")).as("ship_year"),
        month(col("l_shipdate")).as("ship_month"),
        dayofmonth(col("l_shipdate")).as("ship_day"),
        date_format(col("l_shipdate"), "HH:mm:ss").as("ship_time"))
        .orderBy("gen_id", "ship_year", "ship_month", "ship_day", "ship_time")),

    // A-family on the derived measure by category.
    "q19_category_revenue" -> ((s, d) =>
      summary(s, d).groupBy("transaction_category")
        .agg(sumMoney(col("total_price")).as("total_price"))
        .orderBy("transaction_category")),

    // Streaming-analog batch aggregation over the events table.
    "q20_event_type_stats" -> ((s, d) =>
      TestData.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("event_count"),
             sumMoney(col("value")).as("total_value"),
             avgMoney(col("value")).as("avg_value"))
        .orderBy("event_type")),

    // J6's engine-internal pattern: last-writer-wins per key via
    // row_number over (partition by pk order by ts desc).
    "q21_last_event_per_user" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      TestData.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    }),
  )
}
