package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg
import graft.functions.money._
import graft.sources.TestData
import graft.operators.PurchaseSummary

class TopKAggSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def revenueRows() = {
    val st = TestData.star(spark, sf)
    PurchaseSummary.customerPurchaseSummary(
      st.transactions, st.customers, st.products, st.merchants)
      .groupBy("merchant_category", "merchant_name")
      .agg(sum(cents(col("total_price"))).as("rev"))
      .select(col("merchant_category"), col("rev"), col("merchant_name"))
      .as[(String, Long, String)]
  }

  test("aggregator top-3 per category equals the window formulation") {
    val agg = revenueRows()
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TopKAgg.of(3).toColumn.name("top"))
      .flatMap { case (cat, top) => top.map(t => (cat, t._1, t._2)) }
      .collect().sortBy(r => (r._1, -r._2, r._3))

    val w = Window.partitionBy("merchant_category")
      .orderBy(col("rev").desc, col("merchant_name"))
    val win = revenueRows().toDF("merchant_category", "rev", "merchant_name")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("merchant_category", "rev", "merchant_name")
      .as[(String, Long, String)]
      .collect().sortBy(r => (r._1, -r._2, r._3))

    assert(agg.nonEmpty && agg.sameElements(win))
  }

  test("merge is partition-invariant (same result under repartitioning)") {
    val in = (1 to 500).map(i => (s"g${i % 4}", (i * 37 % 101).toLong, s"t$i"))
    def topOf(parts: Int) = in.toDF("g", "s", "t")
      .repartition(parts)
      .select(col("g"), col("s"), col("t")).as[(String, Long, String)]
      .map { case (g, s, t) => (g, (s, t)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopKAgg.of(5).toColumn.name("top"))
      .collect().sortBy(_._1).map { case (g, xs) => g -> xs.toList }
    assert(topOf(2).sameElements(topOf(13)))
  }

  test("ties break deterministically on (score desc, tag asc)") {
    val in = Seq(("g", 10L, "b"), ("g", 10L, "a"), ("g", 10L, "c"), ("g", 9L, "z"))
    val got = in.toDF("g", "s", "t").as[(String, Long, String)]
      .map { case (g, s, t) => (g, (s, t)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(TopKAgg.of(2).toColumn.name("top"))
      .collect().head._2.toList
    assert(got == List((10L, "a"), (10L, "b")))
  }
}
