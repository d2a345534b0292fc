package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("matches the naive range-join formulation on random data") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(400) { i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong)
    }.toDF("lid", "k", "lts")
    // unique (k, ts) on the right, per the operator contract
    val right = Seq.tabulate(300) { i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toDouble)
    }.distinct.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .map { case (k, ts, v) => (k, ts, v) }.toDF("k", "rts", "payload")

    val got = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
      .select("lid", "payload")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    // naive: range join + per-left-row argmax over rts — O(n·m), the
    // semantics oracle
    val w = Window.partitionBy("lid").orderBy(col("rts").desc)
    val naive = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.rts") <= col("l.lts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("lid", "payload")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got.size == 400 && naive.size == 400)
    assert(got == naive)
  }

  test("equal timestamps are inclusive; no prior right row yields null") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 50L), (3L, 2L, 100L))
      .toDF("lid", "k", "lts")
    val right = Seq((1L, 100L, "at100"), (1L, 60L, "at60"))
      .toDF("k", "rts", "tag")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
      .collect().map(r => (r.getAs[Long]("lid"), Option(r.getAs[String]("tag"))))
      .toMap
    assert(out(1L) == Some("at100"), "right row AT the left ts must win")
    assert(out(2L) == None, "no right row at-or-before 50")
    assert(out(3L) == None, "key 2 has no right rows at all")
  }

  test("null timestamps: right nulls never match, left nulls get null payload") {
    val left = Seq((1L, 1L, Some(100L)), (2L, 1L, None))
      .toDF("lid", "k", "lts")
    val right = Seq((1L, Some(50L), "real"), (1L, None, "phantom"))
      .toDF("k", "rts", "tag")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
      .collect().map(r => (r.getAs[Long]("lid"), Option(r.getAs[String]("tag"))))
      .toMap
    assert(out == Map(1L -> Some("real"), 2L -> None))
  }

  test("rejects payload column collisions") {
    val l = Seq((1L, 1L, 1L)).toDF("lid", "k", "lts")
    val r = Seq((1L, 1L, 1L)).toDF("k", "rts", "lid")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "lts", "rts")
    }
  }

  test("plan is one shuffle on the keys (no nested-loop / range-explosion join)") {
    val left = Seq.tabulate(50)(i => (i.toLong, i.toLong % 5, i.toLong))
      .toDF("lid", "k", "lts")
    val right = Seq.tabulate(50)(i => (i.toLong % 5, i.toLong, i.toDouble))
      .toDF("k", "rts", "payload")
    val plan = AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts")
      .queryExecution.executedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(joins.isEmpty, s"as-of must not plan a quadratic join:\n$plan")
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.size <= 2, s"expected at most the union's key shuffle:\n$plan")
  }
}
