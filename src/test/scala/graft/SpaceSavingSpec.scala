package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpaceSavingAgg
import graft.sources.TestData
import graft.text.TextFunctions

class SpaceSavingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tokens() =
    TestData.table(spark, sf, "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .as[String]

  test("capacity ≥ distinct ⇒ exact frequency table (err 0), any partitioning") {
    val exact = tokens().groupByKey(identity).count()
      .collect().map { case (t, c) => (t, c) }
      .sortBy { case (t, c) => (-c, t) }.toSeq
    assert(exact.size <= 64, "testdata vocab grew past the spec's capacity")

    Seq(2, 13).foreach { parts =>
      val got = tokens().repartition(parts)
        .groupByKey(_ => 0).mapValues(identity)
        .agg(SpaceSavingAgg.of(64).toColumn.name("hh"))
        .collect().head._2
      assert(got.forall(_._3 == 0L), "no counter recycled ⇒ zero error")
      assert(got.map(t => (t._1, t._2)) == exact,
        s"summary must equal the exact table under $parts partitions")
    }
  }

  test("boundary: capacity == distinct stays exact under merge") {
    // the bug class this guards: a partition summary that saw ALL
    // `capacity` distinct items losslessly is full (size == capacity),
    // and a lossiness conclusion drawn from size alone would offset
    // items absent from it by its positive minimum count — inflating
    // merged counts and errs right at the boundary the exactness
    // guarantee still covers
    val items = (1 to 16).flatMap(i => Seq.fill(3 * i)(f"tok$i%02d"))
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(2, 7, 16).foreach { parts =>
      val got = items.toDS().repartition(parts)
        .groupByKey(_ => 0).mapValues(identity)
        .agg(SpaceSavingAgg.of(16).toColumn.name("hh"))
        .collect().head._2
      assert(got.forall(_._3 == 0L),
        s"nonzero err at the capacity==distinct boundary ($parts parts)")
      assert(got.map(t => (t._1, t._2)).toMap == exact,
        s"inexact at the capacity==distinct boundary ($parts parts)")
    }
  }

  test("under-capacity sketch: guarantees hold (containment + bounds)") {
    // synthetic skew: token i has frequency ~ 1000/i
    val items = (1 to 60).flatMap(i => Seq.fill(1000 / i)(f"tok$i%02d"))
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    val cap = 16
    val got = items.toDS().repartition(7)
      .groupByKey(_ => 0).mapValues(identity)
      .agg(SpaceSavingAgg.of(cap).toColumn.name("hh"))
      .collect().head._2
    assert(got.size <= cap)
    // guarantee: every item with true freq > n/cap is in the summary
    val mustHave = exact.filter { case (_, c) => c > n / cap }.keySet
    assert(mustHave.subsetOf(got.map(_._1).toSet),
      s"heavy hitters missing: ${mustHave -- got.map(_._1).toSet}")
    // count bounds: count-err ≤ true ≤ count
    got.foreach { case (item, c, e) =>
      val t = exact.getOrElse(item, 0L)
      assert(c - e <= t && t <= c, s"$item: bounds violated ($c, $e, true=$t)")
    }
  }
}
