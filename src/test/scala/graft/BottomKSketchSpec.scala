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

  test("ofLongX64 under capacity: sketch IS the exact key set (q64 regime)") {
    val k = 1 << 10
    val agg = BottomKSketch.ofLongX64(k).toColumn
    // two groups sharing 150 of 400/350 keys, well under k
    val data = ((0L until 400L).map(i => ("a", i)) ++
                (250L until 600L).map(i => ("b", i)))
    val sketches = data.toDS().repartition(8).groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("sk")).collect().toMap
    // under capacity the sketch holds every distinct hash → length exact
    assert(sketches("a").length == 400)
    assert(sketches("b").length == 350)
    // intersection of sketches == hash of intersection of key sets:
    // 64-bit xxhash64 is injective here w.h.p., so overlap is exact
    val inter = sketches("a").toSet.intersect(sketches("b").toSet).size
    assert(inter == 150, s"expected exact overlap 150, got $inter")
    // sketches arrive sorted (merge invariant) for sorted_intersect_size
    assert(sketches("a").toSeq == sketches("a").sorted.toSeq)
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
