package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BottomKSketch

class BottomKSketchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("KMV sketch: exact below k, partition-invariant, estimator sane") {
    val k = 32
    val agg = BottomKSketch.ofString(k).toColumn

    // below k distinct → sketch holds everything → estimate is exact
    val small = (0 until 20).map(i => ("g", s"val$i")).toDS()
    val smallSketch = small.groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("sk")).collect().head._2
    assert(smallSketch.length == 20)
    assert(BottomKSketch.estimateDistinct(smallSketch, k) == 20.0)

    // partition-invariance: 1 partition vs 8 partitions, same sketch
    val data = (0 until 5000).map(i => ("g", s"item${i % 700}"))
    val one = data.toDS().repartition(1).groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("sk")).collect().head._2
    val eight = data.toDS().repartition(8).groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("sk")).collect().head._2
    assert(one.toSeq == eight.toSeq, "sketch must not depend on partitioning")
    assert(one.length == k)

    // estimator within a loose band of the true 700
    val est = BottomKSketch.estimateDistinct(one, k)
    assert(est > 350 && est < 1400, s"estimate $est for true 700")

    // overlap estimation between two groups sharing half their vocab
    val ab = ((0 until 400).map(i => ("a", s"w$i")) ++
              (200 until 600).map(i => ("b", s"w$i"))).toDS()
    val sketches = ab.groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("sk")).collect().toMap
    val j = BottomKSketch.estimateJaccard(sketches("a"), sketches("b"), k)
    assert(j > 0.1 && j < 0.65, s"jaccard estimate $j for true 1/3")
  }

  test("registered as an untyped SQL aggregate") {
    BottomKSketch.register(spark, "bottom_k_sketch", 16)
    graft.sources.TestData.table(spark, sf, "documents")
      .createOrReplaceTempView("docs_sk")
    val rows = spark.sql(
      """SELECT lang, bottom_k_sketch(source) AS sk
         FROM docs_sk GROUP BY lang""").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](1).nonEmpty))
  }
}
