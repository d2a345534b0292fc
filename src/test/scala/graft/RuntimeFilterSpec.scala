package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TestData

/** Runtime bloom-filter join pruning: when a big-big shuffle join has a
  * selective filter on one side, the optimizer must inject a
  * `might_contain(bloom_filter_agg(...))` predicate into the other
  * side's scan — the 100 TB lever that shrinks the probe-side shuffle
  * to keys that can match. The thresholds are lowered here so the
  * testdata sizes qualify; production uses the defaults (10 MB creation
  * side), which exactly target the big-big case. */
class RuntimeFilterSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter into the fact scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "64MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = TestData.table(spark, sf, "lineitem")
      val o = TestData.table(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the result is unaffected by the rewrite
      val n = joined.collect().map(_.getLong(1)).sum
      val expected = li.join(
        TestData.table(spark, sf, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    }
  }

  test("no injection when the filter side is broadcastable (defaults)") {
    // with broadcast enabled the small side broadcasts and no runtime
    // filter is needed — the rewrite must not fire
    val li = TestData.table(spark, sf, "lineitem")
    val o = TestData.table(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
    assert(!joined.queryExecution.optimizedPlan.toString.contains("might_contain"))
  }
}
