package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.PurchaseSummary
import graft.sources.TestData

/** The user-facing session surface: builds a tuned SparkSession and
  * registers the reference-shaped tables and the flagship view as SQL
  * views, so everything a reference user queries by name —
  * `SELECT * FROM customer_purchase_summary` (`0_start_here.ipynb:270`),
  * the raw_cdc tables (`ipynb:153-192`) — works verbatim through
  * `spark.sql`.
  */
object Engine {

  /** Session defaults for this engine: shuffle partitions sized to the
    * machine (not Spark's 200 default), AQE on (runtime re-plan for
    * skew/joins), UTC (oracle parity), and runtime bloom-filter join
    * pruning on — when a big-big shuffle join has a selective filter on
    * one side, the optimizer injects a bloom filter of that side's join
    * keys into the OTHER side's scan, cutting the probe-side shuffle to
    * the keys that can match. At 100 TB this is the difference between
    * shuffling a full fact table and shuffling the ~1% that survives
    * the dim filter (the injection fires only past size thresholds, so
    * small/broadcast joins are untouched). NOTE both runtime-filter
    * configs below MATCH Spark 4's defaults (bloomFilter.enabled=true,
    * semiJoinReduction.enabled=false since 3.4) — they are deliberate
    * PINS documenting the engine's contract against upstream default
    * drift, not behavior changes; no bench delta is attributable to
    * them. */
  def session(master: String = "local[*]",
              shufflePartitions: Int =
                Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
              "false") // bloom beats the semi-join rewrite for our shapes
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register the engine's column functions (vector_dot,
    * cosine_similarity, token_count, quality_score, lang_id,
    * doc_fingerprint, simhash, bottom_k_sketch, …) for spark.sql use. */
  def registerFunctions(spark: SparkSession): Unit =
    org.apache.spark.sql.graft.GraftFunctions.registerAll(spark)

  /** Register the star tables + flagship view for SQL access over a
    * testdata directory. Returns the view DataFrame. */
  def registerViews(spark: SparkSession, dir: String): DataFrame = {
    val st = TestData.star(spark, dir)
    st.transactions.createOrReplaceTempView("transactions")
    st.customers.createOrReplaceTempView("customers")
    st.products.createOrReplaceTempView("products")
    st.merchants.createOrReplaceTempView("merchants")
    val view = PurchaseSummary.customerPurchaseSummary(
      st.transactions, st.customers, st.products, st.merchants)
    view.createOrReplaceTempView("customer_purchase_summary")
    view
  }

  /** Same registration over reference-shaped frames (e.g. CSV seeds or
    * CDC-replicated tables). */
  def registerViews(spark: SparkSession,
                    tables: Map[String, DataFrame]): DataFrame = {
    tables.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    val view = PurchaseSummary.customerPurchaseSummary(
      tables("transactions"), tables("customers"),
      tables("products"), tables("merchants"))
    view.createOrReplaceTempView("customer_purchase_summary")
    view
  }
}
